"""Config/CLI-driven data parallelism: the same synthetic training run,
single-device vs sharded over the 8-virtual-device mesh, must agree.

This is the user-facing face of SURVEY §2.2's headline TPU capability —
`experiment.data_parallel` / `--data-parallel` reach TrainLoop's mesh,
batches are sharded by the prefetcher, and XLA inserts the gradient psum.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from _cli_harness import run_cli_inproc

REPO = Path(__file__).resolve().parent.parent
CFG = REPO / "configs/avmnist/synthetic_dp.yaml"

pytestmark = pytest.mark.skipif(
    not CFG.exists(), reason="synthetic DP config missing"
)


def _run(tmp_path, run_id, extra=()):
    code = run_cli_inproc("mmtpu.cli.train_multimodal", CFG, run_id=run_id,
                          extra=list(extra), cwd=tmp_path,
                          env_extra={"EXP_PATH": str(tmp_path)})
    assert code == 0
    metrics = (tmp_path / "experiments_output/Synthetic_DP/metrics" / run_id
               / "epoch_metrics.json")
    return json.loads(metrics.read_text())


def _epoch_losses(epoch_metrics):
    # the final test-split entry appended to epoch_metrics.json has no
    # "train" key (reference schema) — only count real training epochs
    return [e["train"]["loss"] for e in epoch_metrics if "train" in e]


def test_dp_flag_overrides_and_matches_single_device(tmp_path):
    """--data-parallel 1 (single device) vs the config's data_parallel: -1
    (all 8): same seed, same data -> same per-epoch train losses within fp
    tolerance (SPMD is math-invariant; only the summation order differs)."""
    single = _run(tmp_path, "1", extra=["--data-parallel", "1"])
    sharded = _run(tmp_path, "2")  # config says data_parallel: -1 -> 8
    l1, l8 = _epoch_losses(single), _epoch_losses(sharded)
    assert len(l1) == len(l8) >= 2
    np.testing.assert_allclose(l1, l8, rtol=2e-2)
    assert all(np.isfinite(l) for l in l1 + l8)
    # training actually learns on both paths
    assert l1[-1] < l1[0]
    assert l8[-1] < l8[0]


def test_self_mm_runs_data_parallel(tmp_path):
    """Self-MM's custom loop (sharded prefetchers + per-sample manager
    scatter) completes a 2-epoch run over the 8-device mesh, then runs the
    best-checkpoint test phase (test_metrics.json + a final {"test": ...}
    epoch-metrics entry, like the reference's generic driver)."""
    import json

    cfg = REPO / "configs/mosi/synthetic_self_mm.yaml"
    code = run_cli_inproc("mmtpu.cli.train_multimodal", cfg, run_id="9",
                          extra=["--data-parallel", "8"], cwd=tmp_path,
                          env_extra={"EXP_PATH": str(tmp_path)})
    assert code == 0
    metrics_dirs = sorted(tmp_path.glob("experiments_output/*/metrics/9"))
    assert metrics_dirs, "no metrics dir produced"
    md = metrics_dirs[-1]
    test_recs = json.loads((md / "test_metrics.json").read_text())
    assert test_recs and test_recs[0]["split"] == "test"
    epochs = json.loads((md / "epoch_metrics.json").read_text())
    assert list(epochs[-1].keys()) == ["test"]
    assert "loss" in epochs[-1]["test"]


def test_self_mm_skip_train_tests_current_params(tmp_path):
    """--skip-train must not crash the Self-MM driver (it previously
    dereferenced the omitted train loader) — it skips straight to the
    test phase."""
    import json

    cfg = REPO / "configs/mosi/synthetic_self_mm.yaml"
    code = run_cli_inproc("mmtpu.cli.train_multimodal", cfg, run_id="8",
                          extra=["--skip-train"], cwd=tmp_path,
                          env_extra={"EXP_PATH": str(tmp_path)})
    assert code == 0
    md = sorted(tmp_path.glob("experiments_output/*/metrics/8"))[-1]
    assert (md / "test_metrics.json").exists()


@pytest.mark.parametrize("dp,needle", [("5", "not divisible"),
                                       ("-2", "use -1")])
def test_dp_rejects_bad_values(tmp_path, dp, needle):
    """batch_size 32 % dp 5 != 0, and dp < -1, both fail loudly
    (cli/common.py raises ValueError before any training starts)."""
    with pytest.raises(ValueError, match=needle):
        run_cli_inproc("mmtpu.cli.train_multimodal", CFG, run_id="4",
                       extra=["--data-parallel", dp], cwd=tmp_path,
                       env_extra={"EXP_PATH": str(tmp_path)})
