"""Benchmark: AVMNIST multimodal train samples/sec/chip on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload = the reference's north-star configuration (BASELINE.md):
ResNet18 audio encoder (hidden 64) + ResNet34 image encoder (hidden 128) +
concat fusion MLP, batch 128, Adam(5e-4, wd 1e-4), cross-entropy — the same
model/optimizer the `train_avmnist_resnet_pretrained.yaml` config builds,
driven through mmtpu's jitted train step on synthetic data at real shapes
(32x94 spectrograms, 28x28 images).

vs_baseline divides by the PyTorch-CPU reference-equivalent throughput
measured on this machine by scripts/torch_cpu_baseline.py.
"""

import json
import time

TORCH_CPU_SAMPLES_PER_SEC = 67.2  # scripts/torch_cpu_baseline.py, 20 steps, B=128


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmtpu.models import build_module
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.optim import build_optimizer
    from mmtpu.train.state import TrainState
    from mmtpu.train.step import ClassificationTask, make_train_step
    from mmtpu.config.optim import OptimizerConfig

    B, STEPS, WARMUP = 128, 100, 10

    model = build_module(
        "avmnist",
        audio_encoder=build_module("resnet18", in_channels=1, hidden_dim=64),
        image_encoder=build_module("resnet34", in_channels=1, hidden_dim=128),
        hidden_dim=128,
        dropout=0.5,
        fusion_fn="concat",
    )
    rng = jax.random.PRNGKey(0)
    a = jnp.asarray(np.random.default_rng(0).normal(size=(B, 32, 94, 1)), jnp.float32)
    i = jnp.asarray(np.random.default_rng(1).normal(size=(B, 28, 28, 1)), jnp.float32)
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 10, B))

    variables = model.init({"params": rng}, a, i, train=False)
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 5e-4, "weight_decay": 1e-4}),
        variables["params"],
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    step = make_train_step(task)
    batch = {"audio": a, "image": i, "labels": labels}

    for k in range(WARMUP):
        state, out = step(state, batch, jax.random.fold_in(rng, k))
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for k in range(STEPS):
        state, out = step(state, batch, jax.random.fold_in(rng, k))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    rate = STEPS * B / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "avmnist_multimodal_train_samples_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(rate / TORCH_CPU_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
