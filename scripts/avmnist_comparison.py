"""Pretrained-vs-scratch AVMNIST comparison (reference: avmnist_comparison.py:17-290).

Loads the two experiments' epoch_metrics.json / test_metrics.json, prints
the headline numbers (test accuracy, first-epoch loss, epochs-to-99%,
phase-time comparison) and renders comparison plots.

Usage:
  python scripts/avmnist_comparison.py \
      --scratch experiments_output/AVMNIST_Resnet_Scratch \
      --pretrained experiments_output/AVMNIST_Resnet_Pretrained \
      --pretrain-runs experiments_output/AVMNIST_Audio_Encoder_Resnet_Pretrain \
                      experiments_output/AVMNIST_Image_Encoder_Resnet_Pretrain \
      [--run_id 1] [--out plots/]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root: scripts run from anywhere

from mmtpu.analysis.plotting import plot_loss_curves, plot_metric_curves
from mmtpu.analysis.processing import (
    epochs_to_threshold,
    load_epoch_metrics,
    phase_time_comparison,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", required=True)
    ap.add_argument("--pretrained", required=True)
    ap.add_argument("--pretrain-runs", nargs="*", default=[])
    ap.add_argument("--run_id", default="1")
    ap.add_argument("--out", default="plots")
    ap.add_argument("--acc-metric", default="classification_accuracy_AI")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    hist = {}
    test = {}
    for label, root in (("scratch", args.scratch), ("pretrained", args.pretrained)):
        mdir = Path(root) / "metrics" / str(args.run_id)
        hist[label] = load_epoch_metrics(mdir / "epoch_metrics.json")
        tm = mdir / "test_metrics.json"
        if tm.exists():
            test[label] = json.loads(tm.read_text())

    print("== headline numbers ==")
    for label in ("scratch", "pretrained"):
        if label in test:
            acc = test[label].get(args.acc_metric)
            print(f"test accuracy ({label}): {acc}")
        first_loss = hist[label][0]["train"]["loss"]
        print(f"first-epoch train loss ({label}): {round(first_loss, 4)}")
        e99 = epochs_to_threshold(
            hist[label], args.acc_metric.replace("classification_", "classification_"),
            0.99, split="train",
        )
        print(f"epochs to 99% train accuracy ({label}): {e99}")

    if args.pretrain_runs:
        pre_paths = [
            Path(r) / "metrics" / str(args.run_id) / "epoch_metrics.json"
            for r in args.pretrain_runs
        ]
        times = phase_time_comparison(
            pre_paths,
            Path(args.pretrained) / "metrics" / str(args.run_id) / "epoch_metrics.json",
            Path(args.scratch) / "metrics" / str(args.run_id) / "epoch_metrics.json",
        )
        print("== phase time comparison ==")
        for k, v in times.items():
            print(f"{k}: {v}")

    plot_loss_curves(hist, out / "loss_comparison.png")
    plot_metric_curves(hist, args.acc_metric, "validation", out / "accuracy_comparison.png")
    print(f"plots written to {out}/")


if __name__ == "__main__":
    main()
