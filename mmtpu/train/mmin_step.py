"""MMIN training step (reference: models/msa/mmin.py:110-231).

loss = CE(logits, labels) + MSE(fusion, recon_fusion)
     + cycle-MSE(stop_grad(fusion), recon_cycle)
     [+ MSE(recon_fusion, teacher_embds) when a teacher is configured]

The frozen UttFusion teacher encodes the REVERSE inputs
(original × (1−mask), reference batch keys `{mod}_reverse`,
data/base_dataset.py:72); reverse inputs are synthesized on device here.

Documented deviation — the teacher term: the reference computes the
teacher embedding under no_grad every training forward (mmin.py:91-94)
but its loss (mmin.py:147-152) never consumes it — the MMIN paper's
imputation objective is declared dead in that code. Here the teacher
embedding IS the imputation target (the bracketed term above, weighted
by the configured 'mse' weight); without a teacher the loss is the
reference's exactly. The eval loss matches the reference eval
(mmin.py:210-215: ce + mse + cycle, no teacher) in both cases.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.state import TrainState
from mmtpu.train.step import apply_missing_mask as _masked_impl, masked_mean


def _masked(batch, mod, invert=False):
    return _masked_impl(batch[mod], batch.get(f"{mod}_mask"), invert=invert)


def _weight(loss_group, key):
    return loss_group[key].weight if key in loss_group else 1.0


def _mmin_losses(task, res, batch, stop_grad_fusion=True):
    """Per-sample CE/MSE/cycle terms with padded rows masked out
    (the generic ClassificationTask step does the same masked mean)."""
    import optax

    sm = batch.get("sample_mask")
    lf = task.loss_group
    per_ce = optax.softmax_cross_entropy_with_integer_labels(
        res["logits"].astype(jnp.float32), batch[task.label_key].astype(jnp.int32)
    )
    loss_ce = _weight(lf, "cross_entropy") * masked_mean(per_ce, sm)
    per_mse = jnp.mean((res["fusion"] - res["recon_fusion"]) ** 2, axis=-1)
    loss_mse = _weight(lf, "mse") * masked_mean(per_mse, sm)
    fusion_ref = (
        jax.lax.stop_gradient(res["fusion"]) if stop_grad_fusion else res["fusion"]
    )
    per_cycle = jnp.mean((fusion_ref - res["recon_cycle"]) ** 2, axis=-1)
    loss_cycle = _weight(lf, "cycle") * masked_mean(per_cycle, sm)
    return loss_ce, loss_mse, loss_cycle


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
            from mmtpu.models.norm import batch_mask

            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            # padded tail rows stay out of BatchNorm statistics (models/norm)
            with batch_mask(batch.get("sample_mask")):
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
            loss_ce, loss_mse, loss_cycle = _mmin_losses(task, res, batch)
            total = loss_ce + loss_mse + loss_cycle
            teacher = task.teacher_embeddings(batch)
            if teacher is not None:
                # imputation target: the teacher's full-complement embedding
                per = jnp.mean((res["recon_fusion"] - teacher) ** 2, axis=-1)
                total = total + _weight(task.loss_group, "mse") * masked_mean(
                    per, batch.get("sample_mask")
                )
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
        loss_ce, loss_mse, loss_cycle = _mmin_losses(
            task, res, batch, stop_grad_fusion=False
        )
        loss = loss_ce + loss_mse + loss_cycle
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
