"""Pure jitted train/eval steps — the hot loop.

Design inversion vs the reference (SURVEY.md §7): reference models own
`train_step` with `.to(device)` + `.cpu().numpy()` inside (two host↔device
syncs per step, models/avmnist.py:291-309). Here the step is a pure function
over (TrainState, batch) compiled once per shape:

- gradients + optax update + BN-stat update fused into one XLA program,
- donated state → in-place buffer updates on device,
- outputs (loss, preds, labels, pattern ids) stay on device; the metric
  recorder defers transfer to epoch end (one bulk device_get),
- batch sharded over the mesh 'data' axis; XLA inserts the ICI psum for
  gradient reduction automatically.

A `Task` bundles the model's apply signature so one step builder serves all
model families.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from mmtpu.train.losses import LossFunctionGroup, _masked_reduce
from mmtpu.train.state import TrainState


def apply_missing_mask(x, mask, invert: bool = False):
    """Missing-modality zeroing, fused on device (reference applies it
    per-sample on host, data/base_dataset.py:71-72). invert=True yields the
    `{mod}_reverse` complement. mask=None → x (or zeros for invert)."""
    if mask is None:
        return jnp.zeros_like(x) if invert else x
    m = mask.reshape(mask.shape[0], *([1] * (x.ndim - 1)))
    return x * ((1.0 - m) if invert else m)


def masked_mean(per_sample, sample_mask):
    """Mean over real rows only; plain mean when no padding mask.
    One implementation of masked-batch-mean semantics for the whole
    framework — this is losses._masked_reduce."""
    return _masked_reduce(per_sample, sample_mask)


@dataclasses.dataclass
class ClassificationTask:
    """Single/multi-input classifier: inputs → logits → CE/BCE loss.

    input_keys: batch keys fed positionally to the model.
    multilabel: sigmoid+threshold predictions (MMIMDb) vs argmax.
    """

    model: Any
    loss_group: LossFunctionGroup
    input_keys: Sequence[str] = ("audio", "image")
    label_key: str = "labels"
    multilabel: bool = False
    binary_threshold: float = 0.5

    def apply(self, variables, batch, *, train: bool, rngs=None, mutable=False):
        from mmtpu.models.norm import batch_mask

        inputs = [
            apply_missing_mask(batch[k], batch.get(f"{k}_mask"))
            for k in self.input_keys
        ]
        # publish the padding mask so BatchNorm statistics exclude padded
        # tail rows (models/norm.py) — torch parity for fixed-shape batches
        with batch_mask(batch.get("sample_mask")):
            return self.model.apply(
                variables, *inputs, train=train, rngs=rngs, mutable=mutable
            )

    def predictions(self, logits: jnp.ndarray) -> jnp.ndarray:
        # models with auxiliary heads (e.g. MulT's domain discriminator)
        # return {"logits", "aux_loss"} — unwrap transparently
        if isinstance(logits, dict):
            logits = logits["logits"]
        if self.multilabel:
            return (jax.nn.sigmoid(logits) > self.binary_threshold).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1)

    def loss(self, logits, batch, sample_mask=None) -> jnp.ndarray:
        # sample_mask flows into every criterion so padded tail rows are
        # excluded with the configured weights/kwargs intact (criteria do
        # sum(w·m·l)/sum(w·m) internally — see losses._masked_reduce).
        aux = 0.0
        if isinstance(logits, dict):
            aux = logits.get("aux_loss", 0.0)
            logits = logits["logits"]
        return self.loss_group(
            logits, batch[self.label_key], sample_mask=sample_mask
        )["total_loss"] + aux


def train_step_core(task: ClassificationTask, state: TrainState,
                    batch: Dict[str, Any], step_rng):
    """The ONE definition of a gradient step's math: variables assembly,
    batch_stats mutability, padded-row-masked loss, apply_gradients.
    Shared by the streaming step (make_train_step below) and the
    device-resident scan body (device_loop.make_scan_train_epoch) so the
    two execution modes cannot drift semantically.

    Returns (new_state, loss, logits, grads, sample_mask)."""
    sample_mask = batch.get("sample_mask")

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = task.apply(
            variables,
            batch,
            train=True,
            rngs={"dropout": step_rng},
            mutable=["batch_stats"] if state.batch_stats else False,
        )
        if state.batch_stats:
            logits, updates = out
            new_stats = updates["batch_stats"]
        else:
            logits, new_stats = out, state.batch_stats
        # padded tail rows must not contribute to the loss
        loss = task.loss(logits, batch, sample_mask=sample_mask)
        return loss, (logits, new_stats)

    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
    return new_state, loss, logits, grads, sample_mask


def make_train_step(
    task: ClassificationTask,
    mesh=None,
    donate: bool = True,
    with_grad_stats: bool = False,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) → (state, out).

    with_grad_stats=True additionally returns per-layer gradient stats
    (l2/mean/std/min/max scalars) for the monitoring subsystem — still a
    single compiled program.
    """

    def step(state: TrainState, batch: Dict[str, Any], rng) -> Any:
        new_state, loss, logits, grads, sample_mask = train_step_core(
            task, state, batch, rng
        )
        out = {
            "loss": loss,
            "preds": task.predictions(logits),
            "labels": batch[task.label_key],
        }
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if sample_mask is not None:
            out["sample_mask"] = sample_mask
        if with_grad_stats:
            from mmtpu.monitor.monitor import tree_stats

            out["grad_stats"] = tree_stats(grads)
        return new_state, out

    # mesh is accepted for signature parity with callers; SPMD partitioning
    # comes entirely from the input/state shardings (device_put with
    # NamedSharding) — jit needs no per-mesh variant.
    del mesh
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(task: ClassificationTask, mesh=None) -> Callable:
    del mesh  # SPMD comes from input shardings (see make_train_step)

    def step(state: TrainState, batch: Dict[str, Any]) -> Dict[str, Any]:
        logits = task.apply(state.variables, batch, train=False)
        sample_mask = batch.get("sample_mask")
        loss = task.loss(logits, batch, sample_mask=sample_mask)
        out = {
            "loss": loss,
            "preds": task.predictions(logits),
            "labels": batch[task.label_key],
            "logits": logits,
        }
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if sample_mask is not None:
            out["sample_mask"] = sample_mask
        return out

    return jax.jit(step)

