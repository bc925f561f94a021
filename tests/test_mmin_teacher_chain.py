"""MMIN frozen-teacher chaining: a config naming the reference-era
`best.pth` teacher path restores from the mmtpu `best.ckpt` sibling
(the ch3 MOSEI pipeline's UttFusion -> MMIN handoff)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
CFG = REPO / "configs/mosi/synthetic_mmin_teacher.yaml"


def _make_teacher_ckpt(out: Path):
    import jax
    from flax import serialization

    from mmtpu.models import build_module

    teacher = build_module(
        "utt-fusion",
        netA=build_module("lstmencoder", input_size=5, hidden_size=32,
                          embd_method="maxpool"),
        netV=build_module("lstmencoder", input_size=20, hidden_size=32,
                          embd_method="maxpool"),
        netT=build_module("textcnn", input_size=768, embd_size=32, dropout=0.0),
        netC=build_module("fcclassifier", input_dim=96, layers=[32],
                          output_dim=3, dropout=0.0),
    )
    a = np.zeros((2, 50, 5), np.float32)
    v = np.zeros((2, 50, 20), np.float32)
    t = np.zeros((2, 50, 768), np.float32)
    variables = teacher.init(
        {"params": jax.random.PRNGKey(0)}, a, v, t, train=False
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = {"params": serialization.to_state_dict(variables["params"])}
    if "batch_stats" in variables:
        payload["batch_stats"] = serialization.to_state_dict(
            variables["batch_stats"]
        )
    out.write_bytes(serialization.msgpack_serialize(payload))


def test_mmin_restores_teacher_from_ckpt_sibling(tmp_path):
    _make_teacher_ckpt(tmp_path / "teacher_output/models/7/best.ckpt")
    env = {**os.environ, "PYTHONPATH": str(REPO), "EXP_PATH": str(tmp_path)}
    r = subprocess.run(
        [sys.executable, "-m", "mmtpu.cli.train_multimodal",
         "--config", str(CFG), "--run_id", "7", "--cpu", "--dry-run"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2500:]
    assert "MMIN teacher restored" in (r.stdout + r.stderr)
    assert "dry run complete" in r.stdout
