"""Console theme presets (reference: experiment_utils/themes.py).

Rich style maps applied to the EnhancedConsole; pick with
`get_console_theme(name)`."""

from __future__ import annotations

THEMES = {
    "default": {
        "heading": "bold cyan",
        "success": "bold green",
        "error": "bold red",
        "warning": "bold yellow",
        "metric.name": "cyan",
        "metric.value": "green",
        "progress.description": "white",
    },
    "dark": {
        "heading": "bold bright_white",
        "success": "green",
        "error": "red",
        "warning": "yellow",
        "metric.name": "bright_cyan",
        "metric.value": "bright_green",
        "progress.description": "bright_white",
    },
    "minimal": {
        "heading": "bold",
        "success": "",
        "error": "bold",
        "warning": "",
        "metric.name": "",
        "metric.value": "",
        "progress.description": "",
    },
}


def get_console_theme(name: str = "default"):
    try:
        from rich.theme import Theme

        return Theme(THEMES.get(name, THEMES["default"]))
    except Exception:  # pragma: no cover
        return None
