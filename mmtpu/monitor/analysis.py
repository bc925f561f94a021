"""Offline analysis of monitor_data.h5 (reference:
experiment_utils/monitoring/analysis/analyser.py:9, stats.py).

Reads the gradients/activations/weights groups and computes per-layer
trajectories (the reference's gradient/activation statistics)."""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import Any, Dict, List

import numpy as np


class MonitoringAnalyser:
    def __init__(self, path: str | Path) -> None:
        import h5py

        self.path = Path(path)
        self._file = h5py.File(self.path, "r")

    def close(self) -> None:
        self._file.close()

    def _walk(self, group: str):
        def visit(prefix, node, out):
            import h5py

            for key, item in node.items():
                name = f"{prefix}/{key}" if prefix else key
                if isinstance(item, h5py.Dataset):
                    out.append((name, np.asarray(item)))
                else:
                    visit(name, item, out)

        out: List = []
        if group in self._file:
            visit("", self._file[group], out)
        return out

    def gradient_stats(self) -> Dict[str, Dict[str, List[float]]]:
        """layer → {l2: [...], mean: [...], ...} ordered by (epoch, step)."""
        return self._collect("gradients")

    def activation_stats(self) -> Dict[str, Dict[str, List[float]]]:
        return self._collect("activations")

    def weight_stats(self) -> Dict[str, Dict[str, List[float]]]:
        return self._collect("weights")

    def _collect(self, group: str) -> Dict[str, Dict[str, List[float]]]:
        columns = ("l2", "mean", "std", "min", "max")
        by_layer: Dict[str, List] = defaultdict(list)
        for name, data in self._walk(group):
            parts = name.split("/")
            # epoch_N[/step_M]/layer...
            layer_parts = [
                p for p in parts if not (p.startswith("epoch_") or p.startswith("step_"))
            ]
            step_key = tuple(
                int(p.split("_")[1]) for p in parts if p.startswith(("epoch_", "step_"))
            )
            by_layer["/".join(layer_parts)].append((step_key, data))
        out: Dict[str, Dict[str, List[float]]] = {}
        for layer, rows in by_layer.items():
            rows.sort(key=lambda r: r[0])
            mat = np.stack([r[1] for r in rows])
            out[layer] = {col: mat[:, i].tolist() for i, col in enumerate(columns)}
        return out

    def summary(self) -> Dict[str, Any]:
        g = self.gradient_stats()
        return {
            "num_layers_tracked": len(g),
            "vanishing_gradients": [
                layer for layer, s in g.items() if s["l2"] and max(s["l2"]) < 1e-7
            ],
            "exploding_gradients": [
                layer for layer, s in g.items() if s["l2"] and max(s["l2"]) > 1e3
            ],
        }
