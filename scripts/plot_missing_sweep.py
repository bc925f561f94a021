"""Plot test metric vs training missing-rate per eval pattern.

Renders the ch.3 robustness sweep figure: one line per evaluation pattern
(ATV, AT, ..., V), x = the missing_rate the model was TRAINED with,
y = the test metric on that pattern. The thesis's core claim is the
crossover: training with missing modalities costs a little full-modality
accuracy and buys large gains on degraded patterns.

Usage:
  python scripts/plot_missing_sweep.py --run_id 1 \
      --experiments "UTT_FUSION_BASE_MODEL_MOSEI:0" \
                    "UTT_FUSION_BASE_MODEL_MOSEI_Missing_50:50" ... \
      --metric F1_Macro --out plots/mosei_missing_sweep.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_test_metrics(exp: str, run_id: str, root: Path):
    p = root / "experiments_output" / exp / "metrics" / run_id / "test_metrics.json"
    d = json.loads(p.read_text())
    return d[0] if isinstance(d, list) else d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments", nargs="+", required=True,
                    metavar="DIR:RATE",
                    help="experiment dir name : training missing-rate %%")
    ap.add_argument("--run_id", default="1")
    ap.add_argument("--metric", default="F1_Macro")
    ap.add_argument("--root", default=".")
    ap.add_argument("--out", default="plots/missing_sweep.png")
    args = ap.parse_args()

    root = Path(args.root)
    runs = []
    for spec in args.experiments:
        exp, _, rate = spec.rpartition(":")
        runs.append((float(rate), load_test_metrics(exp, args.run_id, root)))
    runs.sort(key=lambda t: t[0])  # argument order must not zigzag the x axis
    rates = [r for r, _ in runs]
    rows = [m for _, m in runs]

    prefix = args.metric + "_"
    # union over every run — a run that logged fewer patterns must not
    # silently drop the others from the figure
    patterns = sorted(
        {k[len(prefix):] for r in rows for k in r
         if k.startswith(prefix) and k[len(prefix):].isupper()},
        key=lambda p: (-len(p), p),
    )
    fig, ax = plt.subplots(figsize=(10, 6))
    for pat in patterns:
        ys = [r.get(prefix + pat, float("nan")) for r in rows]
        ax.plot(rates, ys, "o-", label=pat, linewidth=2)
    ax.set_xlabel("Training missing rate (%)")
    ax.set_ylabel(args.metric)
    ax.set_title(f"{args.metric} by eval pattern vs training missing rate")
    ax.grid(True, linestyle="--", alpha=0.6)
    ax.legend(title="eval pattern", ncol=2)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(out)
    for pat in patterns:
        vals = ", ".join(
            f"{v:.4f}" if isinstance(v := r.get(prefix + pat), float) else "—"
            for r in rows
        )
        print(f"{prefix}{pat}: {vals}")


if __name__ == "__main__":
    main()
