"""MMIN and RedCore training-step tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.config.optim import OptimizerConfig
from mmtpu.models import build_module
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.mmin_step import MMINTask, make_mmin_eval_step, make_mmin_train_step
from mmtpu.train.optim import build_optimizer
from mmtpu.train.redcore_step import (
    RedCoreSchedState,
    RedCoreTask,
    make_redcore_eval_step,
    make_redcore_train_step,
)
from mmtpu.train.state import TrainState

RNG = jax.random.PRNGKey(0)
LOSSES = LossFunctionGroup.from_dict(
    {
        "cross_entropy": {"loss_name": "cross_entropy", "weight": 1.0},
        "mse": {"loss_name": "mse", "weight": 1.0},
        "cycle": {"loss_name": "cycle", "weight": 1.0},
    }
)


def msa_batch(B=6, seq=12):
    rng = np.random.default_rng(0)
    return {
        "audio": jnp.asarray(rng.normal(size=(B, seq, 5)), jnp.float32),
        "video": jnp.asarray(rng.normal(size=(B, seq, 20)), jnp.float32),
        "text": jnp.asarray(rng.normal(size=(B, seq, 64)), jnp.float32),
        "audio_mask": jnp.ones((B,)),
        "video_mask": jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32),
        "text_mask": jnp.ones((B,)),
        "labels": jnp.asarray(rng.integers(0, 3, B)),
        "pattern_id": jnp.zeros((B,), jnp.int32),
        "sample_mask": jnp.ones((B,)),
    }


def _state(model, variables):
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-3}),
        variables["params"],
    )
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )


class TestMMIN:
    def _build(self, with_teacher=True):
        batch = msa_batch()
        enc = dict(
            netA=build_module("lstmencoder", input_size=5, hidden_size=16),
            netV=build_module("lstmencoder", input_size=20, hidden_size=16),
            netT=build_module("textcnn", input_size=64, embd_size=16, dropout=0.0),
        )
        teacher = None
        teacher_vars = None
        if with_teacher:
            teacher = build_module(
                "utt_fusion",
                netC=build_module(
                    "fcclassifier", input_dim=48, layers=[16], output_dim=3,
                    dropout=0.0,
                ),
                **{k: build_module(
                    "lstmencoder", input_size=s, hidden_size=16
                ) for k, s in (("netA", 5), ("netV", 20))},
                netT=build_module("textcnn", input_size=64, embd_size=16, dropout=0.0),
            )
            teacher_vars = teacher.init(
                {"params": RNG, "dropout": RNG},
                batch["audio"], batch["video"], batch["text"], train=False,
            )
        model = build_module(
            "mmin",
            netAE=build_module(
                "residual_ae", layers=[32, 16], n_blocks=2, input_dim=48, dropout=0.0
            ),
            netC=build_module(
                "fcclassifier", input_dim=32, layers=[16], output_dim=3, dropout=0.0
            ),
            **enc,
        )
        variables = model.init(
            {"params": RNG, "dropout": RNG},
            batch["audio"], batch["video"], batch["text"], train=False,
        )
        task = MMINTask(
            model=model, loss_group=LOSSES,
            teacher_model=teacher, teacher_variables=teacher_vars,
        )
        return task, _state(model, variables), batch

    def test_train_loss_decreases(self):
        task, state, batch = self._build()
        step = make_mmin_train_step(task)
        first = None
        for k in range(20):
            state, out = step(state, batch, jax.random.fold_in(RNG, k))
            if first is None:
                first = float(out["loss"])
        assert float(out["loss"]) < first
        assert set(out["losses"]) == {"ce", "mse", "cycle"}

    def test_eval(self):
        task, state, batch = self._build(with_teacher=False)
        out = make_mmin_eval_step(task)(state, batch)
        assert out["preds"].shape == (6,)


class TestRedCore:
    def _build(self):
        batch = msa_batch()
        tr = lambda w: build_module(  # noqa: E731
            "transformer", width=w, layers=1, heads=2, embd_width=16
        )
        fc = lambda i: build_module(  # noqa: E731
            "fcclassifier", input_dim=i, layers=[16], output_dim=3, dropout=0.0
        )
        xe = build_module(
            "residual_xe", layers=[24], n_blocks=1, input_dim=32, output_dim=16,
            dropout=0.0,
        )
        model = build_module(
            "redcore",
            netA=tr(5), netV=tr(20), netT=tr(64),
            netAE=build_module(
                "residual_ae", layers=[24], n_blocks=1, input_dim=48, dropout=0.0
            ),
            netC=fc(48), netC_A=fc(16), netC_V=fc(16), netC_T=fc(16),
            netAT_V=xe,
            netAV_T=build_module(
                "residual_xe", layers=[24], n_blocks=1, input_dim=32,
                output_dim=16, dropout=0.0,
            ),
            netVT_A=build_module(
                "residual_xe", layers=[24], n_blocks=1, input_dim=32,
                output_dim=16, dropout=0.0,
            ),
        )
        ones = jnp.ones((6,))
        variables = model.init(
            {"params": RNG, "dropout": RNG, "sample": RNG},
            batch["audio"], batch["video"], batch["text"], ones, ones, ones,
            train=False,
        )
        task = RedCoreTask(model=model, loss_group=LOSSES)
        return task, _state(model, variables), batch

    def test_train_step_and_beta_schedule(self):
        task, state, batch = self._build()
        sched = RedCoreSchedState.create()
        step = make_redcore_train_step(task)
        first = None
        for k in range(8):
            state, sched, out = step(state, sched, batch, jax.random.fold_in(RNG, k))
            if first is None:
                first = float(out["loss"])
        assert int(sched.iter_count) == 8
        beta = np.asarray(sched.beta)
        np.testing.assert_allclose(np.linalg.norm(beta), 1.0, rtol=1e-5)
        assert np.isfinite(float(out["loss"]))

    def test_eval(self):
        task, state, batch = self._build()
        out = make_redcore_eval_step(task)(state, batch)
        assert out["preds"].shape == (6,)
