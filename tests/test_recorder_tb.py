"""TensorBoard channel + loss-group selection coverage."""

import numpy as np

from mmtpu.config import MetricConfig
from mmtpu.config.metrics import MetricDef
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.recorder import MetricRecorder


def test_tensorboard_writer_with_allowlist(tmp_path):
    cfg = MetricConfig(
        metrics={
            "accuracy": MetricDef(function="sklearn.metrics.accuracy_score"),
            "f1_macro": MetricDef(
                function="sklearn.metrics.f1_score",
                kwargs={"average": "macro", "zero_division": 0},
            ),
        },
        groups={"classification": ["accuracy", "f1_macro"]},
    )
    rec = MetricRecorder(
        cfg, tensorboard_path=str(tmp_path), tb_record_only=["accuracy"]
    )
    rec.update_group_ids(
        "classification", np.array([1, 0, 1]), np.array([1, 0, 0]),
        np.array([0, 0, 0]), ["ai"],
    )
    rec.calculate_all_groups(epoch=1)
    rec.close()
    events = list(tmp_path.glob("events.out.tfevents.*"))
    assert events, "TensorBoard event file not written"


def test_pure_python_events_readable_by_tensorboard(tmp_path):
    """The hand-encoded TFRecord/proto events must round-trip through the
    real TensorBoard loader (CRC32C masking + Event/Summary encoding)."""
    from mmtpu.utils.tb_writer import SummaryWriter

    w = SummaryWriter(tmp_path)
    w.add_scalar("train/accuracy_AI", 0.75, global_step=3)
    w.add_scalar("train/loss", 1.25, global_step=3)
    w.close()

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    events_file = str(next(tmp_path.glob("events.out.tfevents.*")))
    seen = {}
    for event in EventFileLoader(events_file).Load():
        for value in getattr(event.summary, "value", []):
            # the loader migrates simple_value into a rank-0 tensor
            v = (value.tensor.float_val[0]
                 if value.tensor.float_val else value.simple_value)
            seen[value.tag] = (v, event.step)
    assert seen["train/accuracy_AI"] == (0.75, 3)
    assert seen["train/loss"] == (1.25, 3)


def test_recorder_uses_torch_free_writer(tmp_path):
    import sys

    from mmtpu.train.recorder import MetricRecorder as MR  # noqa: F401
    from mmtpu.utils.tb_writer import SummaryWriter

    cfg = MetricConfig(
        metrics={"accuracy": MetricDef(function="sklearn.metrics.accuracy_score")},
        groups={"classification": ["accuracy"]},
    )
    rec = MetricRecorder(cfg, tensorboard_path=str(tmp_path))
    assert isinstance(rec.writer, SummaryWriter)
    assert "torch.utils.tensorboard" not in sys.modules
    rec.close()


def test_loss_group_key_selection():
    group = LossFunctionGroup.from_dict(
        {
            "cross_entropy": {"loss_name": "cross_entropy", "weight": 1.0},
            "mse": {"loss_name": "mse", "weight": 0.5},
        }
    )
    import jax.numpy as jnp

    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.asarray([0, 1])
    only_ce = group(logits, labels, key="cross_entropy")["total_loss"]
    both = group(logits, labels.astype(jnp.float32) * 0 + 0.5)  # mse needs floats
    assert float(only_ce) > 0
    assert "total_loss" in both

    # override_weight_with rescales the term
    half = group(logits, labels, key="cross_entropy", override_weight_with=0.5)
    assert float(half["total_loss"]) == np.float32(float(only_ce) * 0.5)
