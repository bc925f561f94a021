"""Monitoring subsystem: on-device stat capture → HDF5 → analyser depth
(reference: experiment_utils/monitoring/{monitor,storage}.py and
monitoring/analysis/{analyser,stats}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtpu.config.monitor import MonitorConfig
from mmtpu.config.optim import OptimizerConfig
from mmtpu.models import build_module
from mmtpu.monitor.analysis import MonitoringAnalyser
from mmtpu.monitor.monitor import STAT_COLUMNS, ExperimentMonitor, tree_stats
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.optim import build_optimizer
from mmtpu.train.state import TrainState
from mmtpu.train.step import ClassificationTask, make_train_step


def test_leaf_stats_match_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 16)).astype(np.float32)
    s = dict(zip(STAT_COLUMNS, np.asarray(tree_stats({"w": x})["w"])))
    assert s["l2"] == pytest.approx(np.linalg.norm(x), rel=1e-5)
    assert s["mean"] == pytest.approx(x.mean(), abs=1e-6)
    assert s["median"] == pytest.approx(np.median(x), abs=1e-4)
    assert s["p95"] == pytest.approx(np.percentile(x, 95), abs=1e-3)
    assert s["l1"] == pytest.approx(np.abs(x).sum(), rel=1e-5)
    assert s["positive_fraction"] == pytest.approx((x > 0).mean(), abs=1e-6)
    z = (x - x.mean()) / x.std()
    assert s["skewness"] == pytest.approx((z**3).mean(), abs=1e-3)
    assert s["kurtosis"] == pytest.approx((z**4).mean() - 3.0, abs=1e-2)


@pytest.fixture(scope="module")
def monitored_run(tmp_path_factory):
    # module-scoped: six analyser tests read this HDF5 read-only; re-running
    # the monitored 2-epoch train per test multiplied the suite's slowest
    # compile (grad-stats step) by 6
    tmp_path = tmp_path_factory.mktemp("monitored_run")
    model = build_module(
        "monomodal_encoder",
        encoder=build_module("fcencoder", input_dim=8, layers=[16, 8],
                             dropout=0.0),
        output_dim=8,
        num_classes=4,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 4, 16))
    variables = model.init({"params": rng}, x, train=False)
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-3}),
        variables["params"],
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("x",),
    )
    cfg = MonitorConfig(enabled=True, gradient_interval=1,
                        activation_interval=1, buffer_size=4)
    mon = ExperimentMonitor(cfg, str(tmp_path))
    step = make_train_step(task, with_grad_stats=True, donate=False)
    batch = {"x": x, "labels": labels}
    for epoch in (1, 2):
        mon.start_epoch(epoch)
        for _ in range(2):
            mon.step()
            state, out = step(state, batch, rng)
            mon.record_gradients(out.pop("grad_stats"))
            mon.record_activations(model, state.variables, [x])
        mon.end_epoch(state)
    mon.close()
    return tmp_path / "monitor_data.h5"


class TestReferenceSemantics:
    """Reference-parity behaviors of the monitor itself
    (monitoring/monitor.py in the reference)."""

    def test_exclude_wins_over_include(self, tmp_path):
        cfg = MonitorConfig(enabled=True, include_layers=["encoder"])
        mon = ExperimentMonitor(cfg, str(tmp_path))
        assert mon._keep("encoder/fc_0/kernel")
        # default exclusions apply even inside an include match (:94-99)
        assert not mon._keep("encoder/bn_1/scale")
        assert not mon._keep("head/kernel")  # not included
        mon.close()

    def test_capture_fires_at_step_zero(self, tmp_path):
        """step_count starts at 0 and advances AFTER the batch, so the
        initial-gradient snapshot is captured."""
        cfg = MonitorConfig(enabled=True, gradient_interval=100)
        mon = ExperimentMonitor(cfg, str(tmp_path))
        assert mon.want_gradients  # step 0
        mon.step()
        assert not mon.want_gradients  # step 1
        for _ in range(99):
            mon.step()
        assert mon.want_gradients  # step 100
        mon.close()

    def test_flush_interval_persists_buffered_records(self, tmp_path):
        import h5py

        cfg = MonitorConfig(enabled=True, buffer_size=1000, flush_interval=2)
        mon = ExperimentMonitor(cfg, str(tmp_path))
        mon.start_epoch(1)
        mon.storage.append("gradients", "epoch_1/step_0/x",
                           np.zeros(3, np.float32), {})
        mon.step()
        mon.step()  # hits flush_interval — record must be on disk
        with h5py.File(tmp_path / "monitor_data.h5", "r") as f:
            assert "epoch_1/step_0/x" in f["gradients"]
        mon.close()

    def test_resume_appends_instead_of_truncating(self, tmp_path):
        import h5py

        cfg = MonitorConfig(enabled=True)
        mon = ExperimentMonitor(cfg, str(tmp_path))
        mon.storage.append("gradients", "epoch_1/step_0/x",
                           np.zeros(3, np.float32), {})
        mon.close()
        # a --resume run must keep epoch 1's capture
        mon2 = ExperimentMonitor(cfg, str(tmp_path), resume=True)
        mon2.storage.append("gradients", "epoch_2/step_0/x",
                            np.ones(3, np.float32), {})
        mon2.close()
        with h5py.File(tmp_path / "monitor_data.h5", "r") as f:
            assert "epoch_1/step_0/x" in f["gradients"]
            assert "epoch_2/step_0/x" in f["gradients"]
        # without resume the file is truncated (fresh run semantics)
        mon3 = ExperimentMonitor(cfg, str(tmp_path))
        mon3.close()
        with h5py.File(tmp_path / "monitor_data.h5", "r") as f:
            assert "epoch_1/step_0/x" not in f["gradients"]


class TestAnalyserDepth:
    def test_gradient_stats_have_reference_measures(self, monitored_run):
        with MonitoringAnalyser(monitored_run) as an:
            per = an.analyze_gradients()
        assert set(per) == {1, 2}
        layer = next(iter(per[1].values()))
        for key in ("l2_norm", "l1_norm", "mean", "std", "median", "iqr",
                    "range", "zero_fraction", "positive_fraction",
                    "skewness", "kurtosis", "p5", "p95"):
            assert key in layer, key

    def test_activation_derived_measures(self, monitored_run):
        with MonitoringAnalyser(monitored_run) as an:
            per = an.analyze_activations()
        layer = next(iter(per[1].values()))
        assert "dead_fraction" in layer and "sparsity" in layer
        assert 0.0 <= layer["dead_fraction"] <= 1.0

    def test_weight_spectral_measures(self, monitored_run):
        with MonitoringAnalyser(monitored_run) as an:
            per = an.analyze_weights()
        kernels = {k: v for k, v in per[1].items() if "kernel" in k}
        assert kernels
        some = next(iter(kernels.values()))
        assert "spectral_norm" in some and "condition_number" in some
        assert some["spectral_norm"] > 0
        assert "frobenius_norm" in some

    def test_temporal_evolution(self, monitored_run):
        with MonitoringAnalyser(monitored_run) as an:
            evo = an.get_temporal_evolution("weights")
        layer = next(iter(evo.values()))
        assert [e["epoch"] for e in layer] == [1, 2]

    def test_summary_statistics(self, monitored_run):
        with MonitoringAnalyser(monitored_run) as an:
            summary = an.get_summary_statistics()
        assert summary["training_duration"]["epochs"] == 2
        assert summary["gradients"] and summary["weights"]

    def test_layer_filter(self, monitored_run):
        with MonitoringAnalyser(monitored_run) as an:
            per = an.analyze_gradients(layers=["kernel"])
        assert all("kernel" in k for k in per[1])
