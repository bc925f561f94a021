"""Self-MM training step: weighted L1 multitask loss + self-generated
unimodal label refinement, fully compiled.

Reference algorithm (models/msa/self_mm.py:240-458):
- loss = Σ_m tanh(|y_m − y_f|)-weighted L1(pred_m, label_m); fusion weights 1
- after epoch 1, unimodal labels are refined from pos/neg center distances
  (δ_s vs δ_f) with the running average (e−1)/(e+1)·old + 2/(e+1)·new,
  clamped to ±H (:424-455)
- feature bank rows for the batch are overwritten, centers recomputed.

Here the ManagerState rides through the jitted step; center recomputation
uses masked means over the full banks (identical result to the reference's
post-step recompute).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from mmtpu.train.managers import ManagerState
from mmtpu.train.state import TrainState

MODALITIES = ("multimodal", "audio", "video", "text")


@dataclasses.dataclass
class SelfMMTask:
    model: Any
    need_data_aligned: bool
    H: float = 3.0
    exclude_zero: bool = True

    def apply(self, variables, batch, *, train, rngs=None, mutable=False):
        from mmtpu.models.norm import batch_mask

        A = (batch["audio"], batch.get("audio_lengths"))
        V = (batch["video"], batch.get("video_lengths"))
        # padded tail rows stay out of BatchNorm statistics (models/norm)
        with batch_mask(batch.get("sample_mask")):
            return self.model.apply(
                variables, A, V, batch["text"], train=train, rngs=rngs,
                mutable=mutable,
            )


def weighted_l1(pred, target, weight=None, sample_mask=None):
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    w = jnp.ones_like(pred) if weight is None else weight
    if sample_mask is not None:
        w = w * sample_mask
        return jnp.sum(w * jnp.abs(pred - target)) / jnp.maximum(
            jnp.sum(sample_mask), 1.0
        )
    return jnp.mean(w * jnp.abs(pred - target))


def make_self_mm_train_step(task: SelfMMTask) -> Callable:
    def step(
        state: TrainState,
        managers: ManagerState,
        batch: Dict[str, Any],
        rng,
        epoch: jnp.ndarray,
    ):
        idx = batch["sample_idx"]
        sm = batch.get("sample_mask")

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = task.apply(
                variables, batch, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"] if state.batch_stats else False,
            )
            if state.batch_stats:
                outputs, updates = out
                new_stats = updates["batch_stats"]
            else:
                outputs, new_stats = out, state.batch_stats

            y_f = managers.get_labels("multimodal", idx)
            total = weighted_l1(
                outputs["predictions"]["multimodal"], y_f, sample_mask=sm
            )
            for m in ("audio", "video", "text"):
                y_m = managers.get_labels(m, idx)
                w = jnp.tanh(jnp.abs(y_m - y_f))
                total = total + weighted_l1(
                    outputs["predictions"][m], y_m, w, sample_mask=sm
                )
            return total, (outputs, new_stats)

        (loss, (outputs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)

        features = {
            m: jax.lax.stop_gradient(outputs["features"][m]) for m in MODALITIES
        }

        # -- label refinement (epoch > 1) -----------------------------------
        def refine(mgr: ManagerState) -> ManagerState:
            eps = 1e-8
            f_fus = features["multimodal"]
            d_fp = jnp.linalg.norm(f_fus - mgr.centers_pos["multimodal"], axis=-1)
            d_fn = jnp.linalg.norm(f_fus - mgr.centers_neg["multimodal"], axis=-1)
            delta_f = (d_fn - d_fp) / (d_fp + eps)
            y_fus = mgr.get_labels("multimodal", idx)
            e = epoch.astype(jnp.float32)
            for m in ("audio", "video", "text"):
                f = features[m]
                d_sp = jnp.linalg.norm(f - mgr.centers_pos[m], axis=-1)
                d_sn = jnp.linalg.norm(f - mgr.centers_neg[m], axis=-1)
                # reference :427: delta_s = (d_sn - d_sp) / d_sp + eps
                delta_s = (d_sn - d_sp) / (d_sp) + eps
                alpha = delta_s / (delta_f + eps)
                new = 0.5 * alpha * y_fus + 0.5 * (y_fus + delta_s - delta_f)
                new = jnp.clip(new, -task.H, task.H)
                old = mgr.get_labels(m, idx)
                new = (e - 1.0) / (e + 1.0) * old + 2.0 / (e + 1.0) * new
                mgr = mgr.update_labels(m, idx, new, sample_mask=sm)
            return mgr

        managers = jax.lax.cond(epoch > 1, refine, lambda m: m, managers)
        managers = managers.update_features(features, idx, sample_mask=sm)
        managers = managers.update_centers(exclude_zero=task.exclude_zero)

        out = {
            "loss": loss,
            "preds": outputs["predictions"]["multimodal"].reshape(-1),
            "labels": batch["labels"],
        }
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if "sample_mask" in batch:
            out["sample_mask"] = batch["sample_mask"]
        return new_state, managers, out

    return jax.jit(step, donate_argnums=(0, 1))


def make_self_mm_eval_step(task: SelfMMTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any]):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs = task.apply(variables, batch, train=False)
        preds = outputs["predictions"]["multimodal"].reshape(-1)
        labels = batch["labels"].astype(jnp.float32).reshape(-1)
        # padded tail rows (loader duplicates of the last real sample) must
        # not count toward the validation L1 — save_metric='loss' drives
        # best-checkpoint selection, early stopping, and the plateau LR
        from mmtpu.train.losses import _masked_reduce

        loss = _masked_reduce(jnp.abs(preds - labels),
                              batch.get("sample_mask"))
        out = {"loss": loss, "preds": preds, "labels": batch["labels"]}
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if "sample_mask" in batch:
            out["sample_mask"] = batch["sample_mask"]
        return out

    return jax.jit(step)


def init_manager_labels(
    managers: ManagerState, loader
) -> ManagerState:
    """Prefill label banks from the train loader (reference
    post_init_with_dataloaders :95-106)."""
    import numpy as np

    for batch in loader:
        keep = batch["sample_mask"].astype(bool)
        idx = jnp.asarray(batch["sample_idx"][keep])
        labels = jnp.asarray(np.asarray(batch["labels"])[keep], jnp.float32)
        managers = managers.init_labels(idx, labels)
    return managers
