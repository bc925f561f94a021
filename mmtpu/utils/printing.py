"""Rich console singleton with named progress tasks.

TPU-native counterpart of the reference's EnhancedConsole/ProgressManager
(experiment_utils/printing.py:28,102,298-340): same public surface
(`get_console()`, `start_task`/`update_task`/`complete_task`, metric
tables), falling back to plain prints when rich is unavailable or when
running non-interactively (e.g. under the bench driver).
"""

from __future__ import annotations

import sys
from typing import Dict, Optional

try:
    from rich.console import Console as _RichConsole
    from rich.progress import (
        BarColumn,
        Progress,
        TaskID,
        TextColumn,
        TimeElapsedColumn,
    )
    from rich.table import Table

    _HAS_RICH = True
except Exception:  # pragma: no cover
    _HAS_RICH = False


class EnhancedConsole:
    """Console + named progress tasks; degrades to plain stdout."""

    def __init__(self, enable_progress: Optional[bool] = None) -> None:
        theme = None
        if _HAS_RICH:
            try:
                from mmtpu.utils.themes import get_theme

                theme = get_theme()
            except ValueError as e:
                # unknown MMTPU_THEME: stay usable but say so
                print(f"! {e} — using default console styling")
            except ImportError:  # pragma: no cover
                theme = None
        self._rich = _RichConsole(theme=theme) if _HAS_RICH else None
        if enable_progress is None:
            enable_progress = _HAS_RICH and sys.stdout.isatty()
        self._progress: Optional["Progress"] = None
        self._enable_progress = enable_progress
        self._tasks: Dict[str, "TaskID"] = {}

    # -- printing ---------------------------------------------------------
    def print(self, *args, **kwargs) -> None:
        if self._rich is not None:
            self._rich.print(*args, **kwargs)
        else:
            print(*args)

    def rule(self, title: str = "") -> None:
        if self._rich is not None:
            self._rich.rule(title)
        else:
            print(f"==== {title} ====")

    def error(self, msg: str) -> None:
        self.print(f"[red]✗[/] {msg}" if self._rich else f"ERROR: {msg}")

    def success(self, msg: str) -> None:
        self.print(f"[green]✓[/] {msg}" if self._rich else f"OK: {msg}")

    def warning(self, msg: str) -> None:
        self.print(f"[yellow]![/] {msg}" if self._rich else f"WARN: {msg}")

    # -- progress tasks ----------------------------------------------------
    def _ensure_progress(self) -> None:
        if self._progress is None and self._enable_progress:
            self._progress = Progress(
                TextColumn("[progress.description]{task.description}"),
                BarColumn(),
                TextColumn("{task.completed}/{task.total}"),
                TimeElapsedColumn(),
                console=self._rich,
                transient=True,
            )
            self._progress.start()

    def start_task(self, name: str, total: int, description: str = "") -> None:
        self._ensure_progress()
        if self._progress is not None:
            self._tasks[name] = self._progress.add_task(
                description or name, total=total
            )

    def update_task(self, name: str, advance: int = 1) -> None:
        if self._progress is not None and name in self._tasks:
            self._progress.update(self._tasks[name], advance=advance)

    def complete_task(self, name: str) -> None:
        if self._progress is not None and name in self._tasks:
            self._progress.remove_task(self._tasks.pop(name))
            if not self._tasks:
                self._progress.stop()
                self._progress = None

    # -- tables ------------------------------------------------------------
    def display_confusion_matrix(
        self, matrix, labels=None, title: str = "Confusion Matrix"
    ) -> None:
        """Terminal confusion-matrix rendering
        (reference printing.py:163-296)."""
        import numpy as np

        m = np.asarray(matrix)
        names = labels or [str(i) for i in range(m.shape[0])]
        if self._rich is not None:
            table = Table(title=title)
            table.add_column("true\\pred")
            for n in names:
                table.add_column(str(n), justify="right")
            for i, row in enumerate(m):
                table.add_row(str(names[i]), *[str(int(v)) for v in row])
            self._rich.print(table)
        else:
            print(f"-- {title} --")
            for i, row in enumerate(m):
                print(names[i], " ".join(str(int(v)) for v in row))

    def display_metrics_table(self, title: str, metrics: Dict[str, float]) -> None:
        if self._rich is not None:
            table = Table(title=title)
            table.add_column("Metric")
            table.add_column("Value", justify="right")
            for k in sorted(metrics):
                v = metrics[k]
                table.add_row(k, f"{v:.4f}" if isinstance(v, float) else str(v))
            self._rich.print(table)
        else:
            print(f"-- {title} --")
            for k in sorted(metrics):
                print(f"  {k}: {metrics[k]}")


_console: Optional[EnhancedConsole] = None


def get_console() -> EnhancedConsole:
    global _console
    if _console is None:
        _console = EnhancedConsole()
    return _console
