"""CLI surface tests: reference YAMLs drive our entry points unchanged."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REF_MONO = Path(
    "/root/reference/MML_Suite/configs/avmnist/mono/train_audio_encoder_resnet.yaml"
)
REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    not REF_MONO.exists() or not (REPO / "DATA/avmnist/train_subset.csv").exists(),
    reason="reference configs or AVMNIST index not available",
)
def test_reference_mono_config_dry_run():
    env = {**os.environ, "EXP_PATH": str(REPO)}
    r = subprocess.run(
        [sys.executable, "-m", "mmtpu.cli.train_monomodal",
         "--config", str(REF_MONO), "--run_id", "99", "--cpu", "--dry-run"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dry run complete" in r.stdout


def test_unknown_flag_rejected():
    r = subprocess.run(
        [sys.executable, "-m", "mmtpu.cli.train_multimodal", "--nope"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode != 0
    assert "--config" in r.stderr or "unrecognized" in r.stderr
