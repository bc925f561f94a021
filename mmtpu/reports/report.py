"""Experiment reports (reference: experiment_utils/experiment_report.py:195-755).

Subreports:
- MetricsReport (:308)  → train/validation/test_metrics.json + collected
  ConfusionMatrix columns saved per split (confusion_matrices_{split}.npy,
  :332-339,557); the per-pattern split (`split_missing_conditions` :388)
  feeds the LaTeX report's per-condition tables (:543-549),
- TimingReport (:455)   → timing.csv (per-epoch phase durations),
- ModelReport (:435)    → parameter counts / size,
- EmbeddingVisualizationReport (:410) → PCA scatter of exported embeddings,
- LatexReport (:195)    → report.tex assembling the above; compiled to PDF
  when a LaTeX toolchain is present (graceful skip otherwise).
"""

from __future__ import annotations

import csv
import json
import shutil
import subprocess
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from mmtpu.utils.logging import get_logger

logger = get_logger()


def split_missing_conditions(metrics: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Group flat metric keys by their trailing pattern suffix
    (reference :388-408): 'accuracy_AI' → {'AI': {'accuracy': ...}}."""
    out: Dict[str, Dict[str, Any]] = {}
    for key, value in metrics.items():
        if "_" not in key:
            out.setdefault("overall", {})[key] = value
            continue
        base, suffix = key.rsplit("_", 1)
        if suffix.isupper() and 1 <= len(suffix) <= 4:
            out.setdefault(suffix, {})[base] = value
        else:
            out.setdefault("overall", {})[key] = value
    return out


class MetricsReport:
    def __init__(self, output_dir: Path) -> None:
        self.output_dir = Path(output_dir)
        self.confusion_matrices: Dict[str, Dict[str, list]] = {}

    def generate(
        self,
        metrics_history: Dict[str, List[Dict[str, Any]]],
        test_metrics: Optional[Dict[str, Dict[str, Any]]] = None,
    ) -> Dict[str, str]:
        """Emit `{split}_metrics.json` in the reference's schema: pandas
        to_json(orient='records') of the metrics dataframe
        (experiment_report.py:368-375) — a list of records carrying
        'index'/'split' fields, plus 'Epoch' for train/validation."""
        self.output_dir.mkdir(parents=True, exist_ok=True)
        written = {}
        # ConfusionMatrix columns are popped from the records and collected
        # per split (reference experiment_report.py:332-339) — the generator
        # saves them as confusion_matrices_{split}.npy (:557)
        self.confusion_matrices: Dict[str, Dict[str, list]] = {}

        def drop_cm(split, m):
            out = {}
            for k, v in m.items():
                if "ConfusionMatrix" in k:
                    self.confusion_matrices.setdefault(split, {}).setdefault(
                        k, []
                    ).append(np.asarray(v))
                else:
                    out[k] = v
            return out

        # Reference semantics (experiment_report.py:341-375): all splits are
        # concatenated into ONE dataframe (union of columns, NaN→null fill),
        # then split back with reset_index — so 'index' continues across
        # splits and every record carries every split's columns.
        splits: List[tuple] = [
            (split, [drop_cm(split, m) for m in history])
            for split, history in metrics_history.items()
        ]
        for split, metrics in (test_metrics or {}).items():
            splits.append((split, [drop_cm(split, metrics)]))

        union: List[str] = []
        for _, records in splits:
            for m in records:
                for k in m:
                    if k not in union:
                        union.append(k)

        offset = 0
        for split, records in splits:
            path = self.output_dir / f"{split}_metrics.json"
            payload = []
            for i, m in enumerate(records):
                row = {"index": offset + i}
                row.update({k: m.get(k) for k in union})
                row["split"] = split
                # the reference adds Epoch to train/validation only
                # (experiment_report.py:357-361) — test-style splits
                # (incl. extra eval splits) carry no Epoch column
                if split in ("train", "validation"):
                    row["Epoch"] = i + 1
                payload.append(row)
            offset += len(records)
            path.write_text(json.dumps(_jsonable(payload), indent=4))
            written[split] = str(path)
        return written


class TimingReport:
    def __init__(self, output_dir: Path) -> None:
        self.output_dir = Path(output_dir)

    def generate(self, timing_history: Dict[str, List[float]]) -> str:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        path = self.output_dir / "timing.csv"
        splits = [s for s in timing_history if timing_history[s]]
        n = max((len(timing_history[s]) for s in splits), default=0)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["epoch"] + [f"{s}_time_s" for s in splits])
            for i in range(n):
                w.writerow(
                    [i + 1]
                    + [
                        round(timing_history[s][i], 4)
                        if i < len(timing_history[s])
                        else ""
                        for s in splits
                    ]
                )
        return str(path)


class ModelReport:
    def __init__(self, output_dir: Path) -> None:
        self.output_dir = Path(output_dir)

    def generate(self, params: Any) -> Dict[str, Any]:
        import jax

        leaves = jax.tree_util.tree_leaves(params)
        total = int(sum(np.size(x) for x in leaves))
        # dtype metadata only — np.asarray here would pull every (possibly
        # sharded) parameter to host just to read itemsize
        size_mb = sum(
            np.size(x) * np.dtype(getattr(x, "dtype", np.float32)).itemsize
            for x in leaves
        ) / 2**20
        info = {"total_parameters": total, "size_mb": round(size_mb, 3)}
        self.output_dir.mkdir(parents=True, exist_ok=True)
        (self.output_dir / "model_info.json").write_text(json.dumps(info, indent=4))
        return info


class EmbeddingVisualizationReport:
    def __init__(self, output_dir: Path) -> None:
        self.output_dir = Path(output_dir)

    def generate(self, embeddings_dir: Path) -> Optional[str]:
        embeddings_dir = Path(embeddings_dir)
        if not embeddings_dir.exists():
            return None
        labels_fp = embeddings_dir / "labels.npy"
        labels = np.load(labels_fp) if labels_fp.exists() else None
        paths = []
        for npy in sorted(embeddings_dir.glob("*_embeddings.npy")):
            emb = np.load(npy)
            if emb.ndim != 2 or emb.shape[0] < 3:
                continue
            centered = emb - emb.mean(0)
            _, _, vt = np.linalg.svd(centered, full_matrices=False)
            pts = centered @ vt[:2].T
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(5, 4))
            c = labels[: len(pts)] if labels is not None else None
            if c is not None and c.ndim > 1:
                c = c.argmax(-1)
            sc = ax.scatter(pts[:, 0], pts[:, 1], c=c, s=4, cmap="tab10")
            ax.set_title(npy.stem.replace("_embeddings", "") + " (PCA)")
            out = self.output_dir / f"{npy.stem}_pca.png"
            self.output_dir.mkdir(parents=True, exist_ok=True)
            fig.savefig(out, dpi=120, bbox_inches="tight")
            plt.close(fig)
            paths.append(str(out))
        return paths[0] if paths else None


class LatexReport:
    TEMPLATE = r"""\documentclass{article}
\usepackage{booktabs,graphicx,geometry}
\geometry{margin=1in}
\title{%(title)s}
\begin{document}
\maketitle
\section{Model}
Total parameters: %(params)s (%(size)s MB)
\section{Final Metrics}
\begin{tabular}{lr}\toprule Metric & Value \\ \midrule
%(metric_rows)s
\bottomrule\end{tabular}
%(condition_sections)s
\section{Timing}
Mean train epoch: %(train_time)s s; mean validation epoch: %(val_time)s s.
\end{document}
"""

    def __init__(self, output_dir: Path, title: str) -> None:
        self.output_dir = Path(output_dir)
        self.title = title

    def generate(
        self,
        model_info: Dict[str, Any],
        final_metrics: Dict[str, Any],
        timing: Dict[str, List[float]],
        condition_tables: Optional[Dict[str, Dict[str, Any]]] = None,
    ) -> str:
        rows = "\n".join(
            f"{k.replace('_', r'\_')} & {v:.4f} \\\\"
            for k, v in sorted(final_metrics.items())
            if isinstance(v, (int, float))
        )
        # per-missing-condition tables (reference adds one table per
        # (split, condition) from split_missing_conditions' output,
        # experiment_report.py:543-549)
        cond_tex = ""
        for name, metrics in (condition_tables or {}).items():
            body = "\n".join(
                f"{k.replace('_', r'\_')} & {v:.4f} \\\\"
                for k, v in sorted(metrics.items())
                if isinstance(v, (int, float))
            )
            if not body:
                continue
            cond_tex += (
                f"\n\\subsection{{{name.replace('_', r'_')}}}\n"
                "\\begin{tabular}{lr}\\toprule Metric & Value \\\\ \\midrule\n"
                f"{body}\n\\bottomrule\\end{{tabular}}\n"
            )
        tex = self.TEMPLATE % {
            "title": self.title.replace("_", r"\_"),
            "params": model_info.get("total_parameters", "?"),
            "size": model_info.get("size_mb", "?"),
            "metric_rows": rows,
            "condition_sections": cond_tex,
            "train_time": round(float(np.mean(timing.get("train", [0]) or [0])), 2),
            "val_time": round(float(np.mean(timing.get("validation", [0]) or [0])), 2),
        }
        self.output_dir.mkdir(parents=True, exist_ok=True)
        tex_path = self.output_dir / "report.tex"
        tex_path.write_text(tex)
        if shutil.which("pdflatex"):
            try:
                subprocess.run(
                    ["pdflatex", "-interaction=nonstopmode", tex_path.name],
                    cwd=self.output_dir, capture_output=True, timeout=120,
                )
            except Exception as e:  # pragma: no cover
                logger.warning(f"pdflatex failed: {e}")
        else:
            logger.info("pdflatex not available; emitted report.tex only")
        return str(tex_path)


class ExperimentReportGenerator:
    """Runs all subreports (reference generate_report :481)."""

    def __init__(
        self,
        output_dir: str | Path,
        experiment_name: str,
        metrics_dir: Optional[str | Path] = None,
    ) -> None:
        self.output_dir = Path(output_dir)
        # reference MetricsReport emits {split}_metrics.json at the metrics
        # root (harvested goldens live there), while LaTeX/plots go to the
        # report dir
        self.metrics_dir = Path(metrics_dir) if metrics_dir else self.output_dir
        self.experiment_name = experiment_name

    def generate_report(
        self,
        *,
        metrics_history: Dict[str, List[Dict[str, Any]]],
        timing_history: Dict[str, List[float]],
        params: Any,
        test_metrics: Optional[Dict[str, Dict[str, Any]]] = None,
        embeddings_dir: Optional[Path] = None,
    ) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        metrics_report = MetricsReport(self.metrics_dir)
        out["metrics"] = metrics_report.generate(metrics_history, test_metrics)
        # reference saves the collected ConfusionMatrix columns per split
        # (experiment_report.py:557-560) — analysis/processing.py's
        # load_confusion_matrices reads exactly these files
        for split, cms in metrics_report.confusion_matrices.items():
            # dict payload → 0-d object array; load_confusion_matrices
            # reads it back with allow_pickle + .item()
            np.save(
                Path(self.metrics_dir) / f"confusion_matrices_{split}.npy",
                cms,  # type: ignore[arg-type]
                allow_pickle=True,
            )
        out["timing"] = TimingReport(self.output_dir).generate(timing_history)
        model_info = ModelReport(self.output_dir).generate(params)
        out["model"] = model_info
        if embeddings_dir is not None:
            out["embedding_plot"] = EmbeddingVisualizationReport(
                self.output_dir
            ).generate(embeddings_dir)
        final = {}
        for hist in metrics_history.get("validation", [])[-1:]:
            final = {k: v for k, v in hist.items() if isinstance(v, (int, float))}
        # per-condition sections: last validation epoch + each test split,
        # grouped by trailing pattern suffix (reference :369-375,543-549)
        condition_tables: Dict[str, Dict[str, Any]] = {}
        sources = {"validation": final}
        for split, metrics in (test_metrics or {}).items():
            sources[split] = {
                k: v for k, v in metrics.items() if isinstance(v, (int, float))
            }
        for split, metrics in sources.items():
            for cond, vals in split_missing_conditions(metrics).items():
                if cond != "overall":
                    condition_tables[f"{split}-{cond}"] = vals
        out["latex"] = LatexReport(self.output_dir, self.experiment_name).generate(
            model_info, final, timing_history, condition_tables
        )
        return out


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
