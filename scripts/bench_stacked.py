"""Measure the stacked-runs win at the small batch sizes reference configs
actually use (B=32-256 — the regime where a single run leaves the MXU
underutilized; RESULTS.md sweep: B=128 f32 MFU 0.14).

Compares the north-star AVMNIST ResNet train step:
  single:  1 run,  batch B          -> samples/sec
  stacked: K runs, batch B each     -> aggregate samples/sec (K x B per step)

Same model/optimizer as bench.py; K independent parameter sets via vmap
(mmtpu/train/stacked.py — bit-identical to separate runs, parity-tested).

Run on the real TPU:  python scripts/bench_stacked.py [B=128] [K=8]
Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def build_states(K, B):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmtpu.config.optim import OptimizerConfig
    from mmtpu.models import build_module
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.optim import build_optimizer
    from mmtpu.train.state import TrainState
    from mmtpu.train.step import ClassificationTask

    model = build_module(
        "avmnist",
        audio_encoder=build_module("resnet18", in_channels=1, hidden_dim=64),
        image_encoder=build_module("resnet34", in_channels=1, hidden_dim=128),
        hidden_dim=128, dropout=0.5, fusion_fn="concat",
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    g = np.random.default_rng(0)
    a = jnp.asarray(g.normal(size=(B, 32, 94, 1)), jnp.float32)
    i = jnp.asarray(g.normal(size=(B, 28, 28, 1)), jnp.float32)
    labels = jnp.asarray(g.integers(0, 10, B))
    batch = {"audio": a, "image": i, "labels": labels}

    states, tx = [], None
    for k in range(K):
        v = model.init({"params": jax.random.PRNGKey(k)}, a[:2], i[:2],
                       train=False)
        if tx is None:
            tx, _ = build_optimizer(
                OptimizerConfig(name="Adam",
                                default_kwargs={"lr": 5e-4,
                                                "weight_decay": 1e-4}),
                v["params"],
            )
        states.append(TrainState.create(
            apply_fn=model.apply, params=v["params"],
            batch_stats=v["batch_stats"], tx=tx,
        ))
    return task, states, batch


def timeit(fn, *args, steps=30, windows=3):
    import jax
    import jax.numpy as jnp

    state = args[0]
    rest = args[1:]

    def barrier(st):
        # data-dependent scalar fetch — the only reliable completion
        # barrier over the axon tunnel (bare block_until_ready returns
        # early there; see bench.py methodology) — then drain the state
        s = float(jnp.sum(jax.tree_util.tree_leaves(st.params)[0]))
        jax.block_until_ready(st)
        return s

    out = None
    for _ in range(5):
        state, out = fn(state, *rest)
    barrier(state)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, out = fn(state, *rest)
        barrier(state)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from mmtpu.train.stacked import (
        make_stacked_train_step, stack_states, stack_batches,
    )
    from mmtpu.train.step import make_train_step

    task, states, batch = build_states(K, B)

    single = make_train_step(task, donate=False)
    rng = jax.random.PRNGKey(0)
    dt_single = timeit(lambda s, b, r: single(s, b, r),
                       states[0], batch, rng)

    stacked = stack_states(states)
    sbatch = stack_batches([batch] * K)
    sstep = make_stacked_train_step(task, donate=False)
    rngs = jax.random.split(rng, K)
    dt_stacked = timeit(lambda s, b, r: sstep(s, b, r),
                        stacked, sbatch, rngs)

    single_rate = B / dt_single
    stacked_rate = K * B / dt_stacked
    print(json.dumps({
        "metric": "stacked_runs_samples_per_sec",
        "batch": B, "k": K,
        "single_ms_per_step": round(1e3 * dt_single, 3),
        "stacked_ms_per_step": round(1e3 * dt_stacked, 3),
        "single_samples_per_sec": round(single_rate, 1),
        "stacked_samples_per_sec": round(stacked_rate, 1),
        "speedup": round(stacked_rate / single_rate, 2),
    }))


if __name__ == "__main__":
    main()
