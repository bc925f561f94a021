"""Training-stack tests: optimizer groups, LR controllers, recorder, steps,
checkpoint round-trip, and a tiny end-to-end learn test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtpu.config import MetricConfig, OptimizerConfig
from mmtpu.config.metrics import MetricDef
from mmtpu.models import build_module
from mmtpu.train.early_stopping import EarlyStopping
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.optim import LRController, build_optimizer, set_lr_scale
from mmtpu.train.recorder import MetricRecorder
from mmtpu.train.state import TrainState
from mmtpu.train.step import ClassificationTask, make_eval_step, make_train_step


def tiny_model():
    return build_module("fcclassifier", input_dim=8, layers=[16], output_dim=3,
                        dropout=0.0)


def tiny_state(lr=0.05, opt_cfg=None):
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
    cfg = opt_cfg or OptimizerConfig(name="Adam", default_kwargs={"lr": lr})
    tx, _ = build_optimizer(cfg, params)
    return model, TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats={}
    )


class TestOptim:
    def test_param_group_lrs_differ(self):
        model, _ = tiny_state()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
        cfg = OptimizerConfig(
            name="Adam", default_kwargs={"lr": 0.1},
        )
        tx, report = build_optimizer(
            cfg, params, extra_groups=[("^fc_0/", {"lr": 0.0})]
        )
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                                  batch_stats={})
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        new_state = state.apply_gradients(grads=grads)
        # fc_0 group has lr 0 → unchanged; fc_out moved.
        np.testing.assert_array_equal(
            new_state.params["fc_0"]["kernel"], params["fc_0"]["kernel"]
        )
        assert not np.allclose(
            new_state.params["fc_out"]["kernel"], params["fc_out"]["kernel"]
        )

    def test_overlapping_groups_rejected(self):
        model, _ = tiny_state()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
        cfg = OptimizerConfig(name="Adam", default_kwargs={"lr": 0.1})
        with pytest.raises(ValueError, match="matched by groups"):
            build_optimizer(
                cfg, params,
                extra_groups=[("^fc_0/", {"lr": 0.0}), ("fc_0", {"lr": 1.0})],
            )

    def test_lr_scale_injection(self):
        model, state = tiny_state(lr=0.1)
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        s1 = state.apply_gradients(grads=grads)
        delta_full = np.abs(
            np.asarray(s1.params["fc_out"]["kernel"] - state.params["fc_out"]["kernel"])
        ).mean()
        set_lr_scale(state.opt_state, 0.0)
        s2 = state.apply_gradients(grads=grads)
        np.testing.assert_allclose(
            np.asarray(s2.params["fc_out"]["kernel"]),
            np.asarray(state.params["fc_out"]["kernel"]),
        )
        assert delta_full > 0


class TestLRControllers:
    def test_step_lr(self):
        # step() is called after each epoch; its factor applies to the NEXT
        # epoch (torch last_epoch semantics)
        c = LRController("step", {"step_size": 2, "gamma": 0.1}, base_lr=1.0)
        scales = [c.step() for _ in range(5)]
        assert scales == [1.0, pytest.approx(0.1), pytest.approx(0.1),
                          pytest.approx(0.01), pytest.approx(0.01)]

    def test_plateau(self):
        c = LRController(
            "plateau", {"factor": 0.5, "patience": 1, "mode": "min"}, base_lr=1.0
        )
        assert c.step(1.0) == 1.0
        assert c.step(1.0) == 1.0   # bad 1
        assert c.step(1.0) == 0.5   # bad 2 > patience → decay
        assert c.step(0.2) == 0.5   # improvement, no further decay

    def test_lambda_eval_quirk(self):
        c = LRController("lambda", {"lr_lambda": "0.95 ** epoch"}, base_lr=1.0)
        assert c.step() == pytest.approx(0.95)
        assert c.step() == pytest.approx(0.95**2)

    def test_lambda_full_expression_with_builtins(self):
        # shipped ch3 form: a full "lambda epoch: ..." string using
        # max()/float() builtins and scheduler_args free variables
        args = {
            "lr_lambda": "lambda epoch: 1.0 - max(0, epoch + epoch_count"
                         " - niter) / float(niter_decay + 1)",
            "epoch_count": 1, "niter": 10, "niter_decay": 10,
        }
        c = LRController("lambda", args, base_lr=1.0)
        assert c.step() == pytest.approx(1.0)        # epoch 1
        for _ in range(10):
            last = c.step()
        assert last == pytest.approx(1.0 - 2 / 11)   # epoch 11

    def test_lambda_builtins_stay_restricted(self):
        c = LRController(
            "lambda", {"lr_lambda": "__import__('os').getcwd()"}, base_lr=1.0
        )
        with pytest.raises((NameError, TypeError)):
            c.step()

    def test_exponential(self):
        c = LRController("exponential", {"gamma": 0.5}, base_lr=1.0)
        assert [c.step() for _ in range(3)] == [0.5, 0.25, 0.125]


def make_recorder():
    cfg = MetricConfig(
        metrics={
            "accuracy": MetricDef(function="sklearn.metrics.accuracy_score"),
        },
        groups={"classification": ["accuracy"]},
    )
    return MetricRecorder(cfg)


class TestRecorder:
    def test_pattern_split_and_naming(self):
        rec = make_recorder()
        preds = np.array([0, 1, 1, 0])
        targets = np.array([0, 1, 0, 0])
        ids = np.array([0, 0, 1, 1])
        rec.update_group_ids("classification", preds, targets, ids, ["ai", "a"])
        res = rec.calculate_metrics_for_group("classification")
        assert res["accuracy_AI"] == 1.0
        assert res["accuracy_A"] == 0.5

    def test_sample_mask_excludes_padding(self):
        rec = make_recorder()
        preds = np.array([0, 1, 9, 9])
        targets = np.array([0, 1, 0, 0])
        ids = np.array([0, 0, 0, 0])
        mask = np.array([1.0, 1.0, 0.0, 0.0])
        rec.update_group_ids("classification", preds, targets, ids, ["ai"], mask)
        res = rec.calculate_metrics_for_group("classification")
        assert res["accuracy_AI"] == 1.0

    def test_device_arrays_accepted(self):
        rec = make_recorder()
        rec.update_group_ids(
            "classification",
            jnp.array([1, 0]), jnp.array([1, 0]), jnp.array([0, 0]), ["ai"],
        )
        assert rec.calculate_metrics_for_group("classification")["accuracy_AI"] == 1.0

    def test_z_strip_quirk(self):
        rec = make_recorder()
        rec.update_group("classification", np.array([1]), np.array([1]), "azv")
        res = rec.calculate_metrics_for_group("classification")
        assert "accuracy_AV" in res  # 'z' stripped, upper-cased

    def test_shape_mismatch_raises_at_update(self):
        """Reference parity (:121-122): a preds/targets shape mismatch fails
        at update time, naming the offending step — not at epoch end."""
        import pytest

        rec = make_recorder()
        with pytest.raises(ValueError, match="Shape mismatch"):
            rec.update_group(
                "classification", np.zeros((4, 2)), np.zeros(4), "ai"
            )

    def test_concat_mismatch_skips_modality_not_epoch(self):
        """Reference parity (:179-184): inconsistent shapes ACROSS updates
        for one modality drop that modality's metrics, not the whole
        epoch's."""
        rec = make_recorder()
        rec.update_group("classification", np.zeros((2, 3)), np.zeros((2, 3)), "a")
        rec.update_group("classification", np.zeros((2, 5)), np.zeros((2, 5)), "a")
        rec.update_group("classification", np.array([1, 0]), np.array([1, 0]), "ai")
        res = rec.calculate_metrics_for_group("classification")
        assert res["accuracy_AI"] == 1.0  # healthy modality survives
        assert not any(k.endswith("_A") for k in res)

    def test_reset_clears_current_results(self):
        rec = make_recorder()
        rec.update_group("classification", np.array([1]), np.array([1]), "ai")
        rec.calculate_metrics_for_group("classification")
        assert rec.current_results
        rec.reset()
        assert rec.current_results == {}

    def test_tensorboard_excludes_loss_and_anchors_filters(self):
        """Reference parity (_log_to_tensorboard :236-259): keys containing
        'loss' are never logged, tb_record_only patterns are anchored
        (re.match), tags are '{group}_{key}'."""
        rec = make_recorder()
        logged = []
        rec.writer = type(
            "W", (), {"add_scalar": lambda self, tag, v, step: logged.append(tag)}
        )()
        rec.tb_record_only = ["accuracy"]
        rec.update_group("classification", np.array([1, 0]), np.array([1, 0]), "ai")
        res = rec.calculate_metrics_for_group("classification", epoch=1, loss=0.5)
        assert "loss" in res  # in results…
        assert logged == ["classification_accuracy_AI"]  # …but never in TB
        # anchored: a substring-only pattern must NOT match
        logged.clear()
        rec.tb_record_only = ["ccuracy"]
        rec.calculate_metrics_for_group("classification", epoch=2)
        assert logged == []


class TestSteps:
    def test_tiny_model_learns(self):
        model, state = tiny_state(lr=0.05)
        task = ClassificationTask(
            model=model,
            loss_group=LossFunctionGroup.from_dict(
                {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
            ),
            input_keys=("x",),
        )
        train = make_train_step(task)
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 3, 64)
        x = rng.normal(size=(64, 8)).astype(np.float32) + labels[:, None]
        batch = {"x": jnp.asarray(x), "labels": jnp.asarray(labels)}
        key = jax.random.PRNGKey(0)
        first_loss = None
        for i in range(60):
            state, out = train(state, batch, key)
            if first_loss is None:
                first_loss = float(out["loss"])
        assert float(out["loss"]) < first_loss * 0.3

    def test_sample_mask_zeroes_loss_contribution(self):
        model, state = tiny_state()
        task = ClassificationTask(
            model=model,
            loss_group=LossFunctionGroup.from_dict(
                {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
            ),
            input_keys=("x",),
        )
        ev = make_eval_step(task)
        x = jnp.ones((4, 8))
        labels = jnp.array([0, 1, 2, 0])
        full = ev(state, {"x": x, "labels": labels,
                          "sample_mask": jnp.array([1.0, 1.0, 0.0, 0.0])})
        half = ev(state, {"x": x[:2], "labels": labels[:2],
                          "sample_mask": jnp.array([1.0, 1.0])})
        np.testing.assert_allclose(
            float(full["loss"]), float(half["loss"]), rtol=1e-5
        )

    def test_masked_loss_honours_group_weights_and_kwargs(self):
        # Regression: the padded-batch path used to bypass LossFunctionGroup
        # and hardcode unweighted CE, silently dropping configured weights,
        # class weights, and label_smoothing.
        import optax

        model, state = tiny_state()
        cls_w = [1.0, 2.0, 0.5]
        task = ClassificationTask(
            model=model,
            loss_group=LossFunctionGroup.from_dict(
                {"ce": {"loss_name": "cross_entropy", "weight": 3.0,
                        "loss_kwargs": {"weight": cls_w,
                                        "label_smoothing": 0.1}}}
            ),
            input_keys=("x",),
        )
        ev = make_eval_step(task)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)),
                        jnp.float32)
        labels = jnp.array([0, 1, 2, 0])
        mask = jnp.array([1.0, 1.0, 0.0, 0.0])
        out = ev(state, {"x": x, "labels": labels, "sample_mask": mask})

        logits = model.apply(state.variables, x, train=False)
        smoothed = optax.smooth_labels(jax.nn.one_hot(labels, 3), 0.1)
        per = optax.softmax_cross_entropy(logits, smoothed)
        w = jnp.asarray(cls_w)[labels] * mask
        expected = 3.0 * float(jnp.sum(per * w) / jnp.sum(w))
        np.testing.assert_allclose(float(out["loss"]), expected, rtol=1e-5)


class TestBatchNormPadding:
    """Fixed-shape batches zero-pad tail rows; BatchNorm statistics must be
    computed over REAL rows only (models/norm.py), so a padded batch trains
    bit-identically to the torch reference's smaller real tail batch."""

    def _step(self, batch):
        model = build_module(
            "fcclassifier", input_dim=8, layers=[16], output_dim=3,
            dropout=0.0, use_bn=True,
        )
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
        from mmtpu.config import OptimizerConfig as OC

        tx, _ = build_optimizer(
            OC(name="SGD", default_kwargs={"lr": 0.1}), variables["params"]
        )
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        task = ClassificationTask(
            model=model,
            loss_group=LossFunctionGroup.from_dict(
                {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
            ),
            input_keys=("x",),
        )
        step = make_train_step(task, donate=False)
        new_state, out = step(state, batch, jax.random.PRNGKey(1))
        return jax.device_get(new_state.params), jax.device_get(
            new_state.batch_stats
        ), float(out["loss"])

    def test_padded_batch_trains_like_unpadded(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(5, 8)).astype(np.float32)
        y = rng.integers(0, 3, size=5)
        real = {"x": jnp.asarray(x), "labels": jnp.asarray(y)}
        padded = {
            "x": jnp.concatenate([jnp.asarray(x), jnp.zeros((3, 8))], axis=0),
            "labels": jnp.concatenate([jnp.asarray(y), jnp.zeros(3, y.dtype)]),
            "sample_mask": jnp.asarray([1.0] * 5 + [0.0] * 3),
        }
        p_real, bs_real, loss_real = self._step(real)
        p_pad, bs_pad, loss_pad = self._step(padded)
        assert loss_pad == pytest.approx(loss_real, rel=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            p_real, p_pad,
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            bs_real, bs_pad,
        )


class TestCriterionTorchParity:
    """Criteria whose reductions/weighting have subtle torch semantics:
    values must match the torch modules the reference resolves
    (experiment_utils/loss.py:37-80) on the same inputs."""

    def test_kl_div_matches_torch_mean_reduction(self):
        import torch

        from mmtpu.train.losses import kl_div

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(5, 7)).astype(np.float32)
        log_preds = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        t = rng.dirichlet(np.ones(7), size=5).astype(np.float32)
        want = torch.nn.KLDivLoss()(  # default reduction='mean' = sum/numel
            torch.from_numpy(np.asarray(log_preds)), torch.from_numpy(t)
        ).item()
        got = float(kl_div(log_preds, jnp.asarray(t)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bce_pos_weight_matches_torch_on_soft_targets(self):
        import torch

        from mmtpu.train.losses import bce_with_logits

        rng = np.random.default_rng(1)
        logits = rng.normal(size=(6, 4)).astype(np.float32)
        t = rng.uniform(size=(6, 4)).astype(np.float32)  # soft labels
        pw = np.array([3.0, 1.0, 0.5, 2.0], np.float32)
        want = torch.nn.BCEWithLogitsLoss(pos_weight=torch.from_numpy(pw))(
            torch.from_numpy(logits), torch.from_numpy(t)
        ).item()
        got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(t),
                                    pos_weight=jnp.asarray(pw)))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestEarlyStopping:
    def test_patience(self):
        es = EarlyStopping(patience=2, min_delta=0.0, mode="min")
        assert es.step(1.0)
        assert not es.step(1.5)
        assert not es.step(1.4)
        assert es.should_stop

    def test_improvement_resets(self):
        es = EarlyStopping(patience=2, min_delta=0.0, mode="min")
        es.step(1.0)
        es.step(1.5)
        assert es.step(0.5)
        assert es.counter == 0


class TestCheckpoints:
    def test_roundtrip(self, tmp_path):
        from mmtpu.checkpoints.manager import CheckpointManager

        model, state = tiny_state()
        mgr = CheckpointManager(tmp_path)
        mgr.save_checkpoint(state, epoch=1, metric_value=0.5)
        # perturb, then restore
        zeroed = state.replace(
            params=jax.tree_util.tree_map(jnp.zeros_like, state.params)
        )
        restored = mgr.load_checkpoint(zeroed, "best")
        np.testing.assert_allclose(
            np.asarray(restored.params["fc_out"]["kernel"]),
            np.asarray(state.params["fc_out"]["kernel"]),
        )

    def test_encoder_artifact_roundtrip(self, tmp_path):
        from mmtpu.checkpoints.manager import (
            CheckpointManager,
            load_encoder_checkpoint,
        )

        model, state = tiny_state()
        mgr = CheckpointManager(tmp_path)
        mgr.save_encoder(state.params, "audio")
        # load back into a zeroed copy, including the .pth-name fallback
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        loaded, _ = load_encoder_checkpoint(
            tmp_path / "encoder_audio_best.pth", zeros
        )
        np.testing.assert_allclose(
            np.asarray(loaded["fc_out"]["kernel"]),
            np.asarray(state.params["fc_out"]["kernel"]),
        )


class TestResolveSaveTarget:
    """Best-checkpoint target resolution (shared by TrainLoop and stacked
    CV): exact key, pattern-suffixed fallback, longest-suffix preference,
    loud failure (reference train_multimodal.py:361 raises on a miss)."""

    def test_exact_key(self):
        from mmtpu.train.loop import resolve_save_target

        assert resolve_save_target({"loss": 0.5}, "loss") == 0.5

    def test_pattern_suffix_prefers_longest(self):
        from mmtpu.train.loop import resolve_save_target

        metrics = {"accuracy_A": 0.1, "accuracy_AI": 0.9, "loss": 0.3}
        assert resolve_save_target(metrics, "accuracy") == 0.9

    def test_no_prefix_collision(self):
        from mmtpu.train.loop import resolve_save_target

        # 'accuracy' must never select 'balanced_accuracy_AI'
        metrics = {"balanced_accuracy_AI": 0.7, "accuracy_AI": 0.2}
        assert resolve_save_target(metrics, "accuracy") == 0.2

    def test_missing_raises(self):
        import pytest

        from mmtpu.train.loop import resolve_save_target

        with pytest.raises(ValueError, match="save_metric 'f1'"):
            resolve_save_target({"loss": 0.1, "accuracy_AI": 0.5}, "f1")
