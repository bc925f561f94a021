"""Post-hoc metric processing (reference: results_processing/processing_utils.py:19-709,
experiment_utils/experiment_analyser.py:42).

Loaders for the epoch_metrics.json / test_metrics.json artifacts, multi-run
aggregation (mean/std), pairwise significance tests, and LaTeX tables."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def load_epoch_metrics(path: str | Path) -> List[Dict[str, Any]]:
    return json.loads(Path(path).read_text())


def load_test_metrics(path: str | Path) -> Dict[str, Any]:
    return json.loads(Path(path).read_text())


def _runs(experiment_dir: str | Path, filename: str) -> List[Path]:
    root = Path(experiment_dir) / "metrics"
    return sorted(root.glob(f"*/{filename}"))


def aggregate_runs(
    experiment_dir: str | Path, metric: str, split: str = "validation"
) -> Dict[str, Any]:
    """Mean/std of a metric's best value across run_id subdirectories."""
    values = []
    for path in _runs(experiment_dir, "epoch_metrics.json"):
        history = load_epoch_metrics(path)
        per_epoch = [
            e[split].get("metrics", {}).get(metric)
            for e in history
            if metric in e[split].get("metrics", {})
        ]
        per_epoch = [v for v in per_epoch if v is not None]
        if per_epoch:
            values.append(max(per_epoch))
    if not values:
        return {"metric": metric, "runs": 0}
    return {
        "metric": metric,
        "runs": len(values),
        "mean": float(np.mean(values)),
        "std": float(np.std(values)),
        "values": values,
    }


def significance_test(a: Sequence[float], b: Sequence[float]) -> Dict[str, float]:
    """Welch t-test + Mann-Whitney U (reference ExperimentAnalyser)."""
    from scipy import stats

    a, b = np.asarray(a, float), np.asarray(b, float)
    out: Dict[str, float] = {}
    if len(a) > 1 and len(b) > 1:
        t, p = stats.ttest_ind(a, b, equal_var=False)
        out["t_statistic"], out["t_pvalue"] = float(t), float(p)
        u, p_u = stats.mannwhitneyu(a, b, alternative="two-sided")
        out["u_statistic"], out["u_pvalue"] = float(u), float(p_u)
    out["mean_diff"] = float(np.mean(a) - np.mean(b))
    return out


def compare_experiments(
    dir_a: str | Path,
    dir_b: str | Path,
    metric: str,
    split: str = "validation",
) -> Dict[str, Any]:
    agg_a = aggregate_runs(dir_a, metric, split)
    agg_b = aggregate_runs(dir_b, metric, split)
    out = {"a": agg_a, "b": agg_b}
    if agg_a.get("values") and agg_b.get("values"):
        out["significance"] = significance_test(agg_a["values"], agg_b["values"])
    return out


def epochs_to_threshold(
    history: List[Dict[str, Any]],
    metric: str,
    threshold: float,
    split: str = "train",
) -> Optional[int]:
    """First epoch reaching a threshold (the 'epochs to 99% accuracy'
    convergence statistic in BASELINE.md)."""
    for e in history:
        v = e[split].get("metrics", {}).get(metric)
        if v is None:
            # avmnist nesting: look under pattern keys
            for pat, metrics in e[split].items():
                if isinstance(metrics, dict) and metric in metrics:
                    v = metrics[metric]
                    break
        if v is not None and v >= threshold:
            return e["epoch"]
    return None


def phase_time_comparison(
    pretrain_dirs: Sequence[str | Path],
    main_history_path: str | Path,
    scratch_history_path: str | Path,
) -> Dict[str, float]:
    """Pretrain+main vs scratch wall-time comparison
    (reference avmnist_comparison.plot_phase_time_comparison :237)."""

    def total_time(path: str | Path) -> float:
        hist = load_epoch_metrics(path)
        return sum(
            e[s]["timing"]["total_time"]
            for e in hist
            for s in ("train", "validation")
            if s in e and "timing" in e[s]
        )

    pretrain = sum(total_time(p) for p in pretrain_dirs)
    main = total_time(main_history_path)
    scratch = total_time(scratch_history_path)
    return {
        "pretrain_time_s": round(pretrain, 2),
        "main_time_s": round(main, 2),
        "scratch_time_s": round(scratch, 2),
        "total_vs_scratch_pct": round(100 * (pretrain + main - scratch) / scratch, 2)
        if scratch
        else float("nan"),
        "main_vs_scratch_pct": round(100 * (main - scratch) / scratch, 2)
        if scratch
        else float("nan"),
    }


def latex_table(
    rows: Dict[str, Dict[str, float]], caption: str = "", precision: int = 4
) -> str:
    """rows: {row_name: {col: value}} → booktabs LaTeX table."""
    cols = sorted({c for r in rows.values() for c in r})
    header = " & ".join(["Experiment"] + [c.replace("_", r"\_") for c in cols])
    lines = [
        r"\begin{table}[ht]\centering",
        rf"\caption{{{caption}}}" if caption else "",
        r"\begin{tabular}{l" + "r" * len(cols) + "}",
        r"\toprule",
        header + r" \\",
        r"\midrule",
    ]
    for name, vals in rows.items():
        cells = [
            f"{vals[c]:.{precision}f}" if isinstance(vals.get(c), float) else str(vals.get(c, ""))
            for c in cols
        ]
        lines.append(" & ".join([name.replace("_", r"\_")] + cells) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    return "\n".join(l for l in lines if l)
