"""CMAM frozen-teacher training tests (reference: models/cmams.py:66-250)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.models import build_module
from mmtpu.train.cmam_loss import CMAMLoss
from mmtpu.train.cmam_step import CMAMTask, make_cmam_eval_step, make_cmam_train_step
from mmtpu.train.state import TrainState
from mmtpu.train.optim import build_optimizer
from mmtpu.config.optim import OptimizerConfig

RNG = jax.random.PRNGKey(0)


def small_avmnist():
    enc_args = dict(
        conv_block_one_one_args={"conv_one_in": 1, "conv_one_out": 8},
        conv_block_one_two_args={"conv_one_in": 8, "conv_one_out": 8},
        conv_block_two_one_args={"conv_one_in": 8, "conv_one_out": 16},
        conv_block_two_two_args={"conv_one_in": 16, "conv_one_out": 16},
    )
    audio = build_module("mnist_audio", hidden_dim=12, **enc_args)
    image = build_module("mnist_image", hidden_dim=16, **enc_args)
    return build_module(
        "avmnist", audio_encoder=audio, image_encoder=image,
        hidden_dim=24, dropout=0.0, fusion_fn="concat",
    )


def make_batch(B=8):
    rng = np.random.default_rng(0)
    return {
        "audio": jnp.asarray(rng.normal(size=(B, 32, 94, 1)), jnp.float32),
        "image": jnp.asarray(rng.normal(size=(B, 28, 28, 1)), jnp.float32),
        "audio_mask": jnp.ones((B,)),
        "image_mask": jnp.ones((B,)),
        "labels": jnp.asarray(rng.integers(0, 10, B)),
        "pattern_id": jnp.zeros((B,), jnp.int32),
        "sample_mask": jnp.ones((B,)),
    }


def build_task():
    base = small_avmnist()
    batch = make_batch()
    base_vars = base.init({"params": RNG}, batch["audio"], batch["image"], train=False)

    cmam = build_module(
        "cmam",
        input_encoders={
            "audio": build_module(
                "mnist_audio", hidden_dim=12,
                conv_block_one_one_args={"conv_one_in": 1, "conv_one_out": 8},
                conv_block_one_two_args={"conv_one_in": 8, "conv_one_out": 8},
                conv_block_two_one_args={"conv_one_in": 8, "conv_one_out": 16},
                conv_block_two_two_args={"conv_one_in": 16, "conv_one_out": 16},
            )
        },
        association_network={"input_size": 12, "hidden_size": 32, "output_size": 16},
        target_modality="image",
    )
    cmam_vars = cmam.init(
        {"params": RNG}, {"audio": batch["audio"]}, train=False
    )
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-3}),
        cmam_vars["params"],
    )
    state = TrainState.create(
        apply_fn=cmam.apply,
        params=cmam_vars["params"],
        batch_stats=cmam_vars.get("batch_stats", {}),
        tx=tx,
    )
    task = CMAMTask(
        cmam_model=cmam,
        base_model=base,
        base_variables=base_vars,
        base_model_type="avmnist",
        input_modalities=["audio"],
        target_modality="image",
        loss=CMAMLoss(cls_weight=0.005),
    )
    return task, state, batch, base_vars


class TestCMAM:
    def test_train_step_reduces_reconstruction_loss(self):
        task, state, batch, _ = build_task()
        step = make_cmam_train_step(task)
        first = None
        for k in range(25):
            state, out = step(state, batch, jax.random.fold_in(RNG, k))
            if first is None:
                first = float(out["loss"])
        assert float(out["loss"]) < first

    def test_teacher_frozen(self):
        task, state, batch, base_vars = build_task()
        step = make_cmam_train_step(task)
        before = jax.device_get(base_vars["params"]["image_encoder"]["fc"]["kernel"])
        for k in range(3):
            state, _ = step(state, batch, jax.random.fold_in(RNG, k))
        after = jax.device_get(
            task.base_variables["params"]["image_encoder"]["fc"]["kernel"]
        )
        np.testing.assert_array_equal(before, after)

    def test_eval_step_outputs(self):
        task, state, batch, _ = build_task()
        ev = make_cmam_eval_step(task)
        out = ev(state, batch)
        assert out["rec_embd"].shape == (8, 16)
        assert out["target_embd"].shape == (8, 16)
        assert out["preds"].shape == (8,)
        assert {"cosine", "mae", "mse", "total_loss"} <= set(out["terms"])


class TestDualCMAM:
    """Dual-target C-MAM (reference models/cmams.py:553-895)."""

    def _build(self):
        from mmtpu.train.cmam_step import (
            DualCMAMTask,
            make_dual_cmam_eval_step,
            make_dual_cmam_train_step,
        )

        netA = build_module("lstmencoder", input_size=5, hidden_size=12,
                            embd_method="last")
        netV = build_module("lstmencoder", input_size=20, hidden_size=16,
                            embd_method="last")
        netT = build_module("textcnn", input_size=32, embd_size=20)
        netC = build_module("fcclassifier", input_dim=48, layers=[24],
                            output_dim=3, dropout=0.0)
        base = build_module("utt_fusion", netA=netA, netV=netV, netT=netT,
                            netC=netC)
        rng = np.random.default_rng(0)
        B, T = 8, 10
        batch = {
            "audio": jnp.asarray(rng.normal(size=(B, T, 5)), jnp.float32),
            "video": jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32),
            "text": jnp.asarray(rng.normal(size=(B, T, 32)), jnp.float32),
            "labels": jnp.asarray(rng.integers(0, 3, B)),
            "pattern_id": jnp.zeros((B,), jnp.int32),
            "sample_mask": jnp.ones((B,)),
        }
        base_vars = base.init(
            {"params": RNG}, batch["audio"], batch["video"], batch["text"],
            train=False,
        )
        dual = build_module(
            "dual_cmam",
            input_encoder=build_module("lstmencoder", input_size=5,
                                       hidden_size=12, embd_method="last"),
            shared_encoder_output_size=12,
            decoder_hidden_size=32,
            target_modality_one_embd_size=16,   # video embd size
            target_modality_two_embd_size=20,   # text embd size
            input_modality="audio",
            target_modality_one="video",
            target_modality_two="text",
            dropout=0.0,
        )
        dual_vars = dual.init({"params": RNG}, batch["audio"], train=False)
        tx, _ = build_optimizer(
            OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-2}),
            dual_vars["params"],
        )
        state = TrainState.create(
            apply_fn=dual.apply, params=dual_vars["params"],
            batch_stats=dual_vars.get("batch_stats", {}), tx=tx,
        )
        task = DualCMAMTask(
            cmam_model=dual,
            base_model=base,
            base_variables=base_vars,
            base_model_type="utt-fusion",
            input_modalities=["audio"],
            target_modality="video",
            target_modality_two="text",
            loss=CMAMLoss(mse_weight=1.0, cosine_weight=1.0),
        )
        return (task, state, batch,
                make_dual_cmam_train_step(task), make_dual_cmam_eval_step(task))

    def test_forward_shapes(self):
        task, state, batch, train, ev = self._build()
        out = ev(state, batch)
        assert out["rec_embd"].shape == (8, 16)
        assert out["rec_embd_two"].shape == (8, 20)
        assert out["target_embd"].shape == (8, 16)
        assert out["target_embd_two"].shape == (8, 20)
        assert out["preds"].shape == (8,)

    def test_training_reduces_dual_reconstruction_loss(self):
        task, state, batch, train, ev = self._build()
        first = float(ev(state, batch)["loss"])
        key = jax.random.PRNGKey(1)
        for i in range(40):
            state, out = train(state, batch, jax.random.fold_in(key, i))
        last = float(ev(state, batch)["loss"])
        assert last < first * 0.7, (first, last)

    def test_teacher_frozen(self):
        task, state, batch, train, ev = self._build()
        before = jax.tree_util.tree_leaves(task.base_variables)[0].copy()
        state, _ = train(state, batch, RNG)
        after = jax.tree_util.tree_leaves(task.base_variables)[0]
        np.testing.assert_array_equal(before, after)


class TestSampleMask:
    def test_padded_rows_do_not_change_any_loss_term(self):
        """Every CMAMLoss term (incl. the pairwise MMD and the moment/MI
        batch statistics) must exclude zero-padded tail rows — a padded
        batch's loss equals the unpadded batch's (the torch reference feeds
        ragged tail batches and never sees padding)."""
        rng = np.random.default_rng(5)
        p = rng.normal(size=(5, 16)).astype(np.float32)
        t = rng.normal(size=(5, 16)).astype(np.float32)
        y = rng.integers(0, 4, size=5)
        logits = rng.normal(size=(5, 4)).astype(np.float32)
        loss = CMAMLoss(
            mmd_weight=0.5, moment_weight=0.5, cls_weight=0.1, num_moments=2
        )
        real = loss(
            jnp.asarray(p), jnp.asarray(t),
            cls_logits=jnp.asarray(logits), cls_labels=jnp.asarray(y),
        )
        pad = lambda a: jnp.concatenate(
            [jnp.asarray(a), jnp.zeros((3,) + a.shape[1:], a.dtype)]
        )
        padded = loss(
            pad(p), pad(t),
            cls_logits=pad(logits), cls_labels=pad(y.astype(np.int32)),
            sample_mask=jnp.asarray([1.0] * 5 + [0.0] * 3),
        )
        for k in real:
            np.testing.assert_allclose(
                float(padded[k]), float(real[k]), rtol=1e-5,
                err_msg=f"term {k} shifted under padding",
            )


class TestMultilabelPredictions:
    def test_predictions_follow_base_logits_transform(self):
        """Reference parity (cmams.py:239-243 + mmimdb.py:152-154): a
        multilabel (MM-IMDb) base model's CMAM records sigmoid+threshold
        multi-hot predictions, not an argmax class index — argmax preds
        against multi-hot targets made every multilabel sklearn metric
        (f1_samples etc.) fail silently at epoch end."""
        task, state, batch, _ = build_task()
        logits = jnp.asarray(
            np.random.default_rng(3).normal(size=(4, 23)), jnp.float32
        )
        # default (argmax) path
        assert task.predictions(logits).shape == (4,)
        # multilabel path
        import dataclasses

        ml = dataclasses.replace(task, multilabel=True, binary_threshold=0.5)
        preds = np.asarray(ml.predictions(logits))
        assert preds.shape == (4, 23)
        expected = (1 / (1 + np.exp(-np.asarray(logits))) > 0.5).astype(int)
        np.testing.assert_array_equal(preds, expected)

    def test_multilabel_preds_flow_through_eval_step(self):
        import dataclasses

        task, state, batch, _ = build_task()
        # the tiny base is 10-class AVMNIST; multilabel here just checks
        # the step threads task.predictions through (shape (B, 10) multi-hot)
        ml_task = dataclasses.replace(task, multilabel=True)
        out = make_cmam_eval_step(ml_task)(state, batch)
        assert out["preds"].shape == (8, 10)
        assert set(np.unique(np.asarray(out["preds"]))) <= {0, 1}


class TestForwardKwargAliases:
    def test_class_name_spelling_maps_to_trimodal_letters(self):
        # configs/mosei/centralised/cmams/*/*.yaml declare the BASE model as
        # model_type: "UttFusionModel" (the class name), not "utt-fusion"
        # (the resolver name) — both must resolve to the same kwarg letters
        from mmtpu.train.cmam_step import FORWARD_KWARGS

        for spelling in ("utt-fusion", "utt_fusion", "uttfusionmodel"):
            assert FORWARD_KWARGS[spelling] == {
                "audio": "A", "video": "V", "text": "T",
            }

    def test_kwarg_letters_uses_case_insensitive_model_type(self):
        task, _, _, _ = build_task()
        task = __import__("dataclasses").replace(
            task, base_model_type="UttFusionModel"
        )
        assert task._kwarg_letters()["video"] == "V"
