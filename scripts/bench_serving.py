"""Serving-path benchmark on the real TPU.

Measures, for the AVMNIST north-star model (ResNet18+ResNet34 fusion):
  1. single-sample predict latency (B=1 dispatch — the no-batching floor),
  2. micro-batched throughput: N concurrent clients through MicroBatcher
     at several max_batch settings (the server's actual regime),
  3. exported-artifact call overhead vs the in-process jitted predictor.

Prints one JSON line. Usage: python scripts/bench_serving.py [--clients 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_predictor():
    import jax

    from mmtpu.models import build_module
    from mmtpu.serving import Predictor
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.step import ClassificationTask

    model = build_module(
        "avmnist",
        audio_encoder=build_module("resnet18", in_channels=1, hidden_dim=64),
        image_encoder=build_module("resnet34", in_channels=1, hidden_dim=128),
        hidden_dim=128,
        dropout=0.5,
        fusion_fn="concat",
    )
    g = np.random.default_rng(0)
    a = g.normal(size=(2, 32, 94, 1)).astype(np.float32)
    i = g.normal(size=(2, 28, 28, 1)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, a, i, train=False)
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    return task, variables, Predictor(task, variables)


def sample(g):
    return {
        "audio": g.normal(size=(32, 94, 1)).astype(np.float32),
        "image": g.normal(size=(28, 28, 1)).astype(np.float32),
    }


def bench_single(pred, reps=50):
    g = np.random.default_rng(1)
    s = sample(g)
    batch = {k: v[None] for k, v in s.items()}
    pred(**batch)  # compile B=1
    t0 = time.perf_counter()
    for _ in range(reps):
        pred(**batch)
    return (time.perf_counter() - t0) / reps


def bench_batched(pred, input_keys, clients, max_batch, max_wait_ms=5.0):
    from mmtpu.serving import MicroBatcher

    g = np.random.default_rng(2)
    samples = [sample(g) for _ in range(clients)]
    # pre-warm every power-of-two bucket the batcher can produce — each
    # distinct batch shape is one XLA compile (seconds through the remote
    # tunnel) and must not land inside the timed window
    b = 1
    while True:
        batch = {k: np.stack([s[k] for s in samples[:1]] * b)
                 for k in samples[0]}
        pred(*[batch[k] for k in input_keys])
        if b >= max_batch:
            break
        b = min(b * 2, max_batch)

    with MicroBatcher(pred, input_keys, max_batch=max_batch,
                      max_wait_ms=max_wait_ms) as mb:
        mb(samples[0])
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=min(clients, 64)) as ex:
            futs = [ex.submit(mb, s) for s in samples]
            for f in futs:
                f.result(timeout=300)
        dt = time.perf_counter() - t0
        stats = dict(mb.stats)
    return clients / dt, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=256)
    args = ap.parse_args()

    from mmtpu.utils import compile_cache

    compile_cache.enable_for_backend(
        str(Path(__file__).resolve().parent.parent)
    )
    task, variables, pred = build_predictor()

    single_ms = bench_single(pred) * 1000.0
    rows = {}
    for mb_size in (8, 32, 128):
        rate, stats = bench_batched(
            pred, task.input_keys, args.clients, mb_size
        )
        rows[f"microbatch_{mb_size}_samples_per_sec"] = round(rate, 1)
        rows[f"microbatch_{mb_size}_batches"] = stats["batches"]

    import jax

    print(json.dumps({
        "metric": "serving_avmnist_predict",
        "backend": jax.default_backend(),
        "single_sample_ms": round(single_ms, 3),
        "single_sample_per_sec": round(1000.0 / single_ms, 1),
        "clients": args.clients,
        **rows,
    }))


if __name__ == "__main__":
    main()
