"""Device-resident scan-per-epoch training: parity with the streaming path."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def build_loop(device_resident: str, mesh=None, eval_batch_factor=1,
               ckpt_dir=None, epochs: int = 2, metrics_path=None,
               resume: bool = False, dropout: float = 0.0,
               lr_kind=None, lr_args=None, val_samples: int = 32) -> TrainLoop:
    ds_tr = SyntheticAVMNIST(
        split="train", num_samples=96, selected_patterns=["ai"], seed=1
    )
    ds_va = SyntheticAVMNIST(
        split="valid", num_samples=val_samples,
        selected_patterns=["ai", "a", "i"], seed=1,
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
        hidden_dim=16, dropout=dropout, fusion_fn="concat",
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
    from mmtpu.train.optim import LRController

    return TrainLoop(
        task=task, state=state, loaders=loaders, recorder=MetricRecorder(mc),
        checkpoint_manager=CheckpointManager(ckpt_dir or tempfile.mkdtemp()),
        epochs=epochs, early_stopping=EarlyStopping(enabled=False),
        device_resident=device_resident, mesh=mesh,
        eval_batch_factor=eval_batch_factor,
        metrics_path=metrics_path, resume=resume,
        lr_controller=(
            LRController(lr_kind, lr_args or {}, 1e-3) if lr_kind else None
        ),
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


def test_scan_on_mesh_matches_streaming_and_single_device():
    """Round-3 composition: one-dispatch-per-epoch on a data-parallel mesh.
    scan-on-mesh == streaming-on-mesh == single-device scan (VERDICT r2 #1)."""
    import pytest

    from mmtpu.parallel.mesh import MeshConfig, create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))

    single = build_loop("on")
    assert single._scan
    single.run()

    scan_mesh = build_loop("on", mesh=mesh)
    assert scan_mesh._scan, "device-resident mode must engage on a mesh"
    scan_mesh.run()

    stream_mesh = build_loop("off", mesh=mesh)
    stream_mesh.run()

    for a, b, c in zip(single.epoch_metrics, scan_mesh.epoch_metrics,
                       stream_mesh.epoch_metrics):
        for split in ("train", "validation"):
            assert a[split]["loss"] == pytest.approx(b[split]["loss"], rel=1e-5)
            assert a[split]["loss"] == pytest.approx(c[split]["loss"], rel=1e-5)
    # integer predictions -> identical metrics across all three paths
    assert (
        single.epoch_metrics[-1]["validation"].get("metrics")
        == scan_mesh.epoch_metrics[-1]["validation"].get("metrics")
        == stream_mesh.epoch_metrics[-1]["validation"].get("metrics")
    )


def test_scan_on_mesh_skips_indivisible_batch():
    """A batch size that doesn't shard over the data axis falls back to
    streaming instead of crashing."""
    import pytest

    from mmtpu.parallel.mesh import MeshConfig, create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    loop = build_loop("on", mesh=mesh)
    # rebuild with an indivisible batch size on the train loader
    ds = loop.loaders["train"].dataset
    loop2 = TrainLoop(
        task=loop.task, state=loop.state,
        loaders={"train": BatchLoader(ds, 30, prefetch=0),
                 "validation": loop.loaders["validation"]},
        recorder=loop.recorder, checkpoint_manager=loop.ckpt,
        epochs=1, early_stopping=EarlyStopping(enabled=False), mesh=mesh,
    )
    assert "train" not in loop2._scan
    assert "validation" in loop2._scan


class TestResume:
    """Mid-run resume (--resume): an interrupted-then-resumed run must be
    bit-identical to an uninterrupted one — params, epoch_metrics.json,
    RNG stream, early-stopping state (beyond the reference, which has no
    loop resume; SURVEY §5.4)."""

    def _run(self, tmp_path, mode, tag, epochs, resume=False, dropout=0.5,
             **kw):
        loop = build_loop(
            mode, ckpt_dir=tmp_path / f"ckpt_{tag}", epochs=epochs,
            metrics_path=tmp_path / f"metrics_{tag}", resume=resume,
            dropout=dropout,  # dropout makes RNG-stream divergence visible
            **kw,
        )
        loop.run()
        return loop

    def _assert_same(self, a, b):
        import json

        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            jax.device_get(a.state.params), jax.device_get(b.state.params),
        )
        # step counter continues across the resume — later checkpoints from
        # both runs must record identical step counts
        assert int(np.asarray(a.state.step)) == int(np.asarray(b.state.step))
        def strip_timing(entries):
            return [
                {k: ({kk: vv for kk, vv in v.items() if kk != "timing"}
                     if isinstance(v, dict) else v)
                 for k, v in e.items()}
                for e in entries
            ]

        ea = json.loads((a.metrics_path / "epoch_metrics.json").read_text())
        eb = json.loads((b.metrics_path / "epoch_metrics.json").read_text())
        assert strip_timing(ea) == strip_timing(eb)
        assert a.early.best == b.early.best
        assert a.early.counter == b.early.counter

    @pytest.mark.parametrize("mode", ["off", "on"])
    def test_resumed_equals_uninterrupted(self, tmp_path, mode):
        full = self._run(tmp_path, mode, f"full_{mode}", epochs=4)

        part = self._run(tmp_path, mode, f"part_{mode}", epochs=2)
        assert (part.ckpt.model_dir / "last.ckpt").exists()
        assert (part.ckpt.model_dir / "resume.json").exists()
        # "interruption": a fresh process picks the run back up
        resumed = build_loop(
            mode, ckpt_dir=part.ckpt.model_dir, epochs=4,
            metrics_path=part.metrics_path, resume=True, dropout=0.5,
        )
        resumed.run()
        self._assert_same(full, resumed)

    def test_resumed_equals_uninterrupted_with_decay_lr(self, tmp_path):
        """Regression: non-plateau schedulers (exponential here) never wrote
        LRController._scale, so the resume point stored scale=1.0 and the
        first resumed epoch silently trained at full base LR."""
        lr = dict(lr_kind="exponential", lr_args={"gamma": 0.5})
        full = self._run(tmp_path, "off", "full_lr", epochs=4, **lr)
        part = self._run(tmp_path, "off", "part_lr", epochs=2, **lr)
        resumed = build_loop(
            "off", ckpt_dir=part.ckpt.model_dir, epochs=4,
            metrics_path=part.metrics_path, resume=True, dropout=0.5, **lr,
        )
        resumed.run()
        self._assert_same(full, resumed)

    def test_resume_meta_rides_inside_last_ckpt(self, tmp_path):
        """The loop meta is embedded in last.ckpt (one atomic rename), so
        params and meta can never desynchronize; resume.json is only a
        human-readable mirror and its loss must not break resume."""
        full = self._run(tmp_path, "off", "full_emb", epochs=4)
        part = self._run(tmp_path, "off", "part_emb", epochs=2)
        (part.ckpt.model_dir / "resume.json").unlink()
        resumed = build_loop(
            "off", ckpt_dir=part.ckpt.model_dir, epochs=4,
            metrics_path=part.metrics_path, resume=True, dropout=0.5,
        )
        resumed.run()
        self._assert_same(full, resumed)

    def test_resume_truncates_newer_epoch_metrics(self, tmp_path):
        """A kill between the epoch-metrics write and the resume-point write
        leaves epoch_metrics.json one entry ahead (plus possibly a trailing
        test record); resume must drop those instead of duplicating them."""
        import json

        full = self._run(tmp_path, "off", "full_tr", epochs=4)
        part = self._run(tmp_path, "off", "part_tr", epochs=2)
        fp = part.metrics_path / "epoch_metrics.json"
        entries = json.loads(fp.read_text())
        entries.append({**entries[-1], "epoch": 3})  # orphaned epoch-3 write
        entries.append({"test": {"loss": 0.0}})      # stale test record
        fp.write_text(json.dumps(entries))
        resumed = build_loop(
            "off", ckpt_dir=part.ckpt.model_dir, epochs=4,
            metrics_path=part.metrics_path, resume=True, dropout=0.5,
        )
        resumed.run()
        self._assert_same(full, resumed)
        epochs = [e["epoch"] for e in resumed.epoch_metrics]
        assert epochs == [1, 2, 3, 4]  # no duplicates, no stale records

    def test_resume_with_completed_run_trains_no_more(self, tmp_path):
        part = self._run(tmp_path, "off", "done", epochs=2)
        resumed = build_loop(
            "off", ckpt_dir=part.ckpt.model_dir, epochs=2,
            metrics_path=part.metrics_path, resume=True,
        )
        resumed.run()
        assert len(resumed.epoch_metrics) == 2  # loaded, not retrained

    def test_cli_flag_wires_through(self):
        from mmtpu.cli.common import standard_arg_parser

        args = standard_arg_parser("t").parse_args(
            ["--config", "x.yaml", "--resume"]
        )
        assert args.resume is True

    def test_resume_without_checkpoint_starts_fresh(self, tmp_path):
        loop = build_loop(
            "off", ckpt_dir=tmp_path / "empty", epochs=1,
            metrics_path=tmp_path / "m", resume=True,
        )
        loop.run()
        assert len(loop.epoch_metrics) == 1


def test_eval_batch_factor_bit_identical_with_tail():
    """Fusing the patterns x samples eval product into larger scan batches
    (--eval-batch-factor) is bit-identical: predictions cover the same
    (sample, pattern) set AND the epoch loss is unchanged — the fused
    dispatch reduces losses per ORIGINAL batch, so the mean-of-batch-means
    is preserved even across a partial tail batch (120 eval rows at B=32
    → 4 original batches, the last 24 rows)."""
    base = build_loop("on", val_samples=40)  # 40 x 3 patterns = 120 rows
    base.run()
    fused = build_loop("on", eval_batch_factor=3, val_samples=40)
    assert fused._scan["validation"][2] == 96  # 32 * 3
    assert fused._scan["train"][2] == 32  # train batch untouched
    fused.run()
    for a, b in zip(base.epoch_metrics, fused.epoch_metrics):
        assert a["validation"]["loss"] == b["validation"]["loss"]
        assert (
            a["validation"].get("metrics") == b["validation"].get("metrics")
        )


def test_eval_batch_factor_auto():
    """Factor None = auto: fused eval batches grow toward ~1024 rows,
    capped by the epoch (here 3 steps of 32 → factor 3)."""
    from mmtpu.train.loop import _auto_eval_factor

    assert _auto_eval_factor(128, 30000) == 8      # 8x cap
    assert _auto_eval_factor(512, 30000) == 2      # 1024-row target
    assert _auto_eval_factor(1024, 30000) == 1     # already large
    assert _auto_eval_factor(32, 96) == 3          # capped by epoch steps
    loop = build_loop("on", eval_batch_factor=None)
    assert loop._scan["validation"][2] == 96  # 32 x auto-factor 3
    assert loop._scan["train"][2] == 32


def test_auto_budget_is_cumulative(monkeypatch):
    """'auto' admits splits against ONE shared budget (everything admitted
    is resident simultaneously), train first — three splits that each fit
    individually must not all be admitted when their SUM exceeds it."""
    from mmtpu.train import device_loop as dl

    ds_bytes = None

    def fake_nbytes(ds):
        return ds_bytes

    monkeypatch.setattr(dl, "dataset_nbytes", fake_nbytes)
    # per-split size 60% of budget: train fits, validation (and any later
    # split) must stream
    monkeypatch.setattr(
        dl, "DEFAULT_BUDGET_BYTES", 100, raising=True
    )
    ds_bytes = 60
    loop = build_loop("auto")
    assert "train" in loop._scan
    assert "validation" not in loop._scan


def test_test_restores_params_to_device():
    """test() restores the best checkpoint (host-numpy leaves) and must
    commit it back to device ONCE — leaving numpy leaves in self.state
    makes the streaming eval path re-upload the whole parameter tree
    every batch (review finding; ~16 MB/s over the axon tunnel)."""
    loop = build_loop("off", epochs=1)
    loop.loaders["test"] = loop.loaders["validation"]
    loop.run()
    loop.test()
    leaves = jax.tree_util.tree_leaves(loop.state.params)
    assert all(isinstance(l, jax.Array) for l in leaves)
