"""Config/CLI-driven data parallelism: the same synthetic training run,
single-device vs sharded over the 8-virtual-device mesh, must agree.

This is the user-facing face of SURVEY §2.2's headline TPU capability —
`experiment.data_parallel` / `--data-parallel` reach TrainLoop's mesh,
batches are sharded by the prefetcher, and XLA inserts the gradient psum.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
CFG = REPO / "configs/avmnist/synthetic_dp.yaml"

pytestmark = pytest.mark.skipif(
    not CFG.exists(), reason="synthetic DP config missing"
)


def _run(tmp_path, run_id, extra=()):
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO),
        "EXP_PATH": str(tmp_path),
        "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8").strip(),
    }
    r = subprocess.run(
        [sys.executable, "-m", "mmtpu.cli.train_multimodal",
         "--config", str(CFG), "--run_id", run_id, "--cpu", *extra],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2500:]
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
    scatter) completes a 2-epoch run over the 8-device mesh."""
    cfg = REPO / "configs/mosi/synthetic_self_mm.yaml"
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO),
        "EXP_PATH": str(tmp_path),
        "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8").strip(),
    }
    r = subprocess.run(
        [sys.executable, "-m", "mmtpu.cli.train_multimodal",
         "--config", str(cfg), "--run_id", "9", "--cpu",
         "--data-parallel", "8"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2500:]


@pytest.mark.parametrize("dp,needle", [("5", "not divisible"),
                                       ("-2", "use -1")])
def test_dp_rejects_bad_values(tmp_path, dp, needle):
    """batch_size 32 % dp 5 != 0, and dp < -1, both fail loudly."""
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO),
        "EXP_PATH": str(tmp_path),
        "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8").strip(),
    }
    r = subprocess.run(
        [sys.executable, "-m", "mmtpu.cli.train_multimodal",
         "--config", str(CFG), "--run_id", "4", "--cpu",
         "--data-parallel", dp],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=560,
    )
    assert r.returncode != 0
    assert needle in (r.stderr + r.stdout)


