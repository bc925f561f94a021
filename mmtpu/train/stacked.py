"""Stacked runs: train K independent models in ONE compiled program.

TPU-native answer to the reference's sequential sweeps (`run_n.sh` repeats a
config N times; cross-validation loops folds one after another,
train_multimodal.py:920-1102): vmap the train/eval step over a leading run
axis so K runs (different seeds, or different CV folds) execute as one XLA
program. Small-batch configs (B=32-256, the regime every reference config
uses) underutilize the chip per step; stacking K runs multiplies the work
per dispatch without changing any run's math — each run keeps its own
params, optimizer state, batch stream, and RNG.

Semantics: bit-identical to running the K programs separately (vmap is a
batching transform, not an approximation); verified by
tests/test_stacked.py parity tests.

Usage:
    states  = stack_states([s1, s2, ...])          # leading K axis
    step    = make_stacked_train_step(task)
    states, outs = step(states, stacked_batch, rngs)   # rngs: (K, 2) keys
    s1, s2, ... = unstack_states(states, k=K)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.train.step import ClassificationTask, make_eval_step, make_train_step


def stack_trees(trees: Sequence[Any]) -> Any:
    """Stack K same-structure pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack_tree(tree: Any, k: int) -> List[Any]:
    return [
        jax.tree_util.tree_map(lambda x, i=i: x[i], tree) for i in range(k)
    ]


def stack_states(states: Sequence[Any]) -> Any:
    """Stack K TrainStates (params, opt_state, batch_stats, step counters).

    The states must share apply_fn/tx (same model/optimizer config — the
    run_n / CV setting); array leaves are stacked, and the resulting state
    is a valid pytree for the vmapped step."""
    return stack_trees(list(states))


def unstack_states(stacked: Any, k: int) -> List[Any]:
    return unstack_tree(stacked, k)


def stack_batches(batches: Sequence[Dict[str, np.ndarray]]) -> Dict[str, Any]:
    """Stack K per-run batches: every key gains a leading K axis."""
    keys = batches[0].keys()
    return {
        key: jnp.stack([jnp.asarray(b[key]) for b in batches]) for key in keys
    }


def make_stacked_train_step(
    task: ClassificationTask, donate: bool = True
) -> Callable:
    """vmap the standard train step over the leading run axis.

    Signature: (stacked_state, stacked_batch, rngs) -> (stacked_state, outs)
    where rngs is a (K,)-stacked PRNG key array (one independent dropout
    stream per run) and every out leaf carries the K axis.

    Padding steps leave a fold's state untouched: when a fold's
    sample_mask is all zero (StackedLoaderGroup re-feeds the last batch
    after the fold is exhausted), its gradients are zero but a plain
    optax update would still move params (Adam momentum) and refresh BN
    running stats from the stale batch — breaking bit-parity with
    separate runs of unequal length. The per-fold select keeps the old
    state for dead steps (under vmap, lax-style cond lowers to select
    anyway, so this costs one cheap elementwise select per leaf)."""
    base = make_train_step(task, donate=False)

    def inner(state, batch, rng):
        new_state, out = base(state, batch, rng)
        mask = batch.get("sample_mask")
        if mask is None:
            return new_state, out
        live = jnp.any(mask > 0)
        guarded = jax.tree_util.tree_map(
            lambda n, o: jnp.where(live, n, o), new_state, state
        )
        return guarded, out

    vstep = jax.vmap(inner, in_axes=(0, 0, 0), out_axes=(0, 0))
    return jax.jit(vstep, donate_argnums=(0,) if donate else ())


def make_stacked_eval_step(task: ClassificationTask) -> Callable:
    inner = make_eval_step(task)
    return jax.jit(jax.vmap(inner, in_axes=(0, 0), out_axes=0))


def stacked_rngs(rng: jax.Array, k: int) -> jax.Array:
    return jax.random.split(rng, k)


class StackedLoaderGroup:
    """Iterate K BatchLoaders in lockstep, yielding stacked batches.

    Runs (folds) may have different lengths: exhausted loaders keep
    yielding their last batch shape with sample_mask zeroed, so every
    stacked step has a static (K, B, ...) shape and finished folds
    contribute nothing to loss or metrics."""

    def __init__(self, loaders: Sequence[Any]) -> None:
        self.loaders = list(loaders)
        self.k = len(loaders)

    def __len__(self) -> int:
        return max(len(ld) for ld in self.loaders)

    def __iter__(self):
        iters = [iter(ld) for ld in self.loaders]
        lasts: List[Any] = [None] * self.k
        for _ in range(len(self)):
            group = []
            for i, it in enumerate(iters):
                try:
                    b = next(it)
                    lasts[i] = b
                except StopIteration:
                    if lasts[i] is None:
                        raise ValueError(
                            f"stacked run {i} produced zero batches — its "
                            "split is empty (too few samples for this "
                            "fold?); stacking needs every run to yield at "
                            "least one batch"
                        )
                    b = dict(lasts[i])
                    b["sample_mask"] = np.zeros_like(
                        np.asarray(b.get(
                            "sample_mask",
                            np.ones(np.asarray(b["labels"]).shape[0],
                                    np.float32),
                        ))
                    )
                group.append(b)
            # every run must expose sample_mask so padded/finished rows are
            # excluded uniformly
            for b in group:
                if "sample_mask" not in b:
                    b["sample_mask"] = np.ones(
                        np.asarray(b["labels"]).shape[0], np.float32
                    )
            yield stack_batches(group)
