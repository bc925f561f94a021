"""MMIN training step (reference: models/msa/mmin.py:110-231).

loss = CE(logits, labels) + MSE(fusion, recon_fusion)
     + cycle-MSE(stop_grad(fusion), recon_cycle)

The frozen UttFusion teacher encodes the REVERSE inputs
(original × (1−mask), reference batch keys `{mod}_reverse`,
data/base_dataset.py:72); reverse inputs are synthesized on device here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.state import TrainState


def _masked(batch, mod, invert=False):
    x = batch[mod]
    mask = batch.get(f"{mod}_mask")
    if mask is None:
        return x if not invert else jnp.zeros_like(x)
    m = mask.reshape(mask.shape[0], *([1] * (x.ndim - 1)))
    return x * ((1.0 - m) if invert else m)


@dataclasses.dataclass
class MMINTask:
    model: Any
    loss_group: LossFunctionGroup
    teacher_model: Any = None       # frozen UttFusion
    teacher_variables: Any = None
    input_keys = ("audio", "video", "text")
    label_key: str = "labels"

    def teacher_embeddings(self, batch):
        """Teacher encodes the complement (reverse) inputs."""
        if self.teacher_model is None:
            return None
        A = _masked(batch, "audio", invert=True)
        V = _masked(batch, "video", invert=True)
        T = _masked(batch, "text", invert=True)
        outs = self.teacher_model.apply(
            self.teacher_variables, A, V, T, train=False,
            method=self.teacher_model.encode,
        )
        return jax.lax.stop_gradient(jnp.concatenate(list(outs), axis=-1))


def make_mmin_train_step(task: MMINTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any], rng):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = state.apply_fn(
                variables,
                _masked(batch, "audio"),
                _masked(batch, "video"),
                _masked(batch, "text"),
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if state.batch_stats else False,
            )
            if state.batch_stats:
                res, updates = out
                new_stats = updates["batch_stats"]
            else:
                res, new_stats = out, state.batch_stats
            lf = task.loss_group
            loss_ce = lf(res["logits"], batch[task.label_key], key="cross_entropy")[
                "total_loss"
            ]
            # imputation target: the teacher's full-complement embedding if a
            # teacher is configured, else self-reconstruction (reference uses
            # fusion↔recon_fusion MSE, :147)
            loss_mse = lf(res["fusion"], res["recon_fusion"], key="mse")["total_loss"]
            loss_cycle = lf(
                jax.lax.stop_gradient(res["fusion"]), res["recon_cycle"], key="cycle"
            )["total_loss"]
            total = loss_ce + loss_mse + loss_cycle
            teacher = task.teacher_embeddings(batch)
            if teacher is not None:
                total = total + lf(res["recon_fusion"], teacher, key="mse")[
                    "total_loss"
                ]
            return total, (res, new_stats, loss_ce, loss_mse, loss_cycle)

        (loss, (res, new_stats, l_ce, l_mse, l_cyc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        out = {
            "loss": loss,
            "losses": {"ce": l_ce, "mse": l_mse, "cycle": l_cyc},
            "preds": jnp.argmax(res["logits"], axis=-1),
            "labels": batch[task.label_key],
        }
        for k in ("pattern_id", "sample_mask"):
            if k in batch:
                out[k] = batch[k]
        return new_state, out

    return jax.jit(step, donate_argnums=(0,))


def make_mmin_eval_step(task: MMINTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any]):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        res = state.apply_fn(
            variables,
            _masked(batch, "audio"),
            _masked(batch, "video"),
            _masked(batch, "text"),
            train=False,
        )
        lf = task.loss_group
        loss = (
            lf(res["logits"], batch[task.label_key], key="cross_entropy")["total_loss"]
            + lf(res["fusion"], res["recon_fusion"], key="mse")["total_loss"]
            + lf(res["fusion"], res["recon_cycle"], key="cycle")["total_loss"]
        )
        out = {
            "loss": loss,
            "preds": jnp.argmax(res["logits"], axis=-1),
            "labels": batch[task.label_key],
        }
        for k in ("pattern_id", "sample_mask"):
            if k in batch:
                out[k] = batch[k]
        return out

    return jax.jit(step)
