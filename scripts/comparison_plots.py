"""Render every reference comparison figure from two experiment runs.

Consolidated CLI over mmtpu.analysis.comparison_plots (the reference ships
five hardcoded scripts: plot_comparison.py, additional_plots.py,
plot_time_comparison.py, result_comparison.py, plot_total_training_time.py).

Usage:
  python scripts/comparison_plots.py \
      --pretrained experiments_output/AVMNIST_Pretrained/metrics/1 \
      --baseline experiments_output/AVMNIST_Scratch/metrics/1 \
      [--pretrain-run name=path/to/metrics/1 ...] [--out plots/comparison]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root: scripts run from anywhere

from mmtpu.analysis.comparison_plots import (
    load_train_metrics,
    plot_additional_metrics,
    plot_cumulative_time,
    plot_loss_and_epoch_times,
    plot_model_comparison,
    plot_phase_time_bars,
    plot_total_training_time,
)
from mmtpu.analysis.processing import load_epoch_metrics


def _phase_total(epoch_metrics) -> float:
    return sum(
        float(e[s]["timing"]["total_time"])
        for e in epoch_metrics
        for s in ("train", "validation")
        if s in e and "timing" in e.get(s, {})
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", required=True,
                    help="metrics run dir of the pretrained-arm experiment")
    ap.add_argument("--baseline", required=True,
                    help="metrics run dir of the scratch-arm experiment")
    ap.add_argument("--pretrain-run", action="append", default=[],
                    metavar="NAME=DIR",
                    help="label=metrics-dir of a monomodal pretrain phase "
                         "(for the stacked total-time bar)")
    ap.add_argument("--acc-metric", default="accuracy_AI")
    ap.add_argument("--pattern", default="AI")
    ap.add_argument("--out", default="plots/comparison")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    pre_dir, base_dir = Path(args.pretrained), Path(args.baseline)
    pre_train = load_train_metrics(pre_dir / "train_metrics.json")
    base_train = load_train_metrics(base_dir / "train_metrics.json")
    pre_epochs = load_epoch_metrics(pre_dir / "epoch_metrics.json")
    base_epochs = load_epoch_metrics(base_dir / "epoch_metrics.json")

    made = [
        plot_model_comparison(pre_train, base_train, out, acc_key=args.acc_metric),
        plot_additional_metrics(pre_train, base_train, out,
                                acc_key=args.acc_metric, pattern=args.pattern),
        plot_cumulative_time(pre_epochs, base_epochs, out),
        *plot_loss_and_epoch_times(
            {"With Pretraining": pre_epochs, "Without Pretraining": base_epochs},
            out,
        ),
        plot_phase_time_bars(
            {"With Pretraining": pre_epochs, "Without Pretraining": base_epochs},
            out,
        ),
    ]

    if args.pretrain_run:
        phases = {}
        for spec in args.pretrain_run:
            name, _, d = spec.partition("=")
            phases[name] = _phase_total(
                load_epoch_metrics(Path(d) / "epoch_metrics.json")
            )
        made.append(
            plot_total_training_time(
                _phase_total(base_epochs), phases, _phase_total(pre_epochs), out
            )
        )

    for p in made:
        print(p)


if __name__ == "__main__":
    main()
