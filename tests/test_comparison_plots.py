"""Comparison-figure parity: every plot the reference's five one-off
scripts emit renders from synthetic metric JSONs via the consolidated CLI."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _make_run(root: Path, n_epochs=6, seed=0):
    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    train = []
    epochs = []
    for e in range(1, n_epochs + 1):
        flat = {
            "loss": float(3.0 / e + rng.random() * 0.1),
            "accuracy_AI": float(1 - 1 / (e + 1)),
        }
        for m in ("f1", "precision", "recall"):
            for fl in ("macro", "micro", "weighted"):
                flat[f"{m}_{fl}_AI"] = float(1 - 1 / (e + 1) + rng.random() * 0.02)
        train.append(flat)
        epochs.append({
            "epoch": e,
            "train": {"loss": flat["loss"],
                      "timing": {"total_time": 2.0 + rng.random(),
                                 "avg_batch_time": 0.1}},
            "validation": {"loss": flat["loss"] * 1.1,
                           "timing": {"total_time": 0.5, "avg_batch_time": 0.1}},
        })
    epochs.append({"test": {"loss": 0.4, "timing": {"total_time": 0.7}}})
    (root / "train_metrics.json").write_text(json.dumps(train))
    (root / "epoch_metrics.json").write_text(json.dumps(epochs))


def test_all_comparison_figures_render(tmp_path):
    pre, base, mono = tmp_path / "pre", tmp_path / "base", tmp_path / "mono"
    for d, s in ((pre, 1), (base, 2), (mono, 3)):
        _make_run(d, seed=s)
    out = tmp_path / "plots"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts/comparison_plots.py"),
         "--pretrained", str(pre), "--baseline", str(base),
         "--pretrain-run", f"audio={mono}", "--out", str(out)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    expected = [
        "model_comparison.png",             # plot_comparison.py
        "model_comparison_metrics.png",     # additional_plots.py
        "total_time_comparison_cumulative.png",  # plot_time_comparison.py
        "comparison_loss.png",              # result_comparison.py
        "comparison_epoch_times.png",       # result_comparison.py
        "comparison_total_time_by_phase.png",    # result_comparison.py
        "total_time_comparison.png",        # plot_total_training_time.py
    ]
    for name in expected:
        f = out / name
        assert f.exists() and f.stat().st_size > 1000, name
    assert "Detailed time statistics" in r.stdout
