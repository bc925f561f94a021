"""Device-resident scan-per-epoch training: parity with the streaming path."""

import tempfile

import jax
import jax.numpy as jnp

from mmtpu.checkpoints.manager import CheckpointManager
from mmtpu.config import MetricConfig
from mmtpu.config.metrics import MetricDef
from mmtpu.config.optim import OptimizerConfig
from mmtpu.data.avmnist import SyntheticAVMNIST
from mmtpu.data.loader import BatchLoader
from mmtpu.models import build_module
from mmtpu.train.early_stopping import EarlyStopping
from mmtpu.train.loop import TrainLoop
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.optim import build_optimizer
from mmtpu.train.recorder import MetricRecorder
from mmtpu.train.state import TrainState
from mmtpu.train.step import ClassificationTask


def build_loop(device_resident: str) -> TrainLoop:
    ds_tr = SyntheticAVMNIST(
        split="train", num_samples=96, selected_patterns=["ai"], seed=1
    )
    ds_va = SyntheticAVMNIST(
        split="valid", num_samples=32, selected_patterns=["ai", "a", "i"], seed=1
    )
    loaders = {
        "train": BatchLoader(ds_tr, 32, shuffle=True, seed=5, prefetch=0),
        "validation": BatchLoader(ds_va, 32, prefetch=0),
    }
    model = build_module(
        "avmnist",
        audio_encoder=build_module(
            "fcencoder", input_dim=3008, layers=[16], dropout=0.0
        ),
        image_encoder=build_module(
            "fcencoder", input_dim=784, layers=[16], dropout=0.0
        ),
        hidden_dim=16, dropout=0.0, fusion_fn="concat",
    )
    rng = jax.random.PRNGKey(0)
    v = model.init(
        {"params": rng}, jnp.zeros((2, 32, 94, 1)), jnp.zeros((2, 28, 28, 1)),
        train=False,
    )
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-3}), v["params"]
    )
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"],
        batch_stats=v.get("batch_stats", {}), tx=tx,
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    mc = MetricConfig(
        metrics={"accuracy": MetricDef(function="sklearn.metrics.accuracy_score")},
        groups={"classification": ["accuracy"]},
    )
    return TrainLoop(
        task=task, state=state, loaders=loaders, recorder=MetricRecorder(mc),
        checkpoint_manager=CheckpointManager(tempfile.mkdtemp()),
        epochs=2, early_stopping=EarlyStopping(enabled=False),
        device_resident=device_resident,
    )


def test_scan_matches_streaming_exactly():
    stream = build_loop("off")
    stream.run()
    scan = build_loop("on")
    assert scan._scan, "device-resident mode should have engaged"
    scan.run()
    import pytest

    for a, b in zip(stream.epoch_metrics, scan.epoch_metrics):
        # losses agree to float32 ulp (different XLA fusions reorder sums)
        assert a["train"]["loss"] == pytest.approx(b["train"]["loss"], rel=1e-5)
        assert a["validation"]["loss"] == pytest.approx(
            b["validation"]["loss"], rel=1e-5
        )
    # integer predictions → metrics must match exactly
    assert (
        stream.epoch_metrics[-1]["validation"].get("metrics")
        == scan.epoch_metrics[-1]["validation"].get("metrics")
    )


def test_save_metric_accuracy_selects_pattern_qualified_key():
    """Regression: save_metric='accuracy' must match the group/pattern-
    qualified key ('classification_accuracy_AI'), not fall through to loss
    with max-mode."""
    loop = build_loop("off")
    loop.save_metric = "accuracy"
    loop.early.mode = "max"
    loop.ckpt.mode = "max"
    loop.run()
    # best tracked on a [0,1] accuracy, not a ~2.3 loss
    assert loop.early.best is not None and 0.0 <= loop.early.best <= 1.0
