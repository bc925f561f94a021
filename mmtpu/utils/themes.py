"""Console theme catalog (reference: experiment_utils/themes.py, 212 LoC).

The reference ships nine rich Themes built from the canonical public
palettes (Monokai, Nord, Solarized, Dracula, GitHub, One Dark, Tokyo Night,
Gruvbox, Catppuccin). Here the same theme surface is generated from each
palette's standard accent colors; select with the MMTPU_THEME env var or
`get_theme(name)`.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

# (info, warning, error, success, highlight, heading) accents per palette —
# the standard published palette values.
_PALETTES: Dict[str, tuple] = {
    "monokai": ("#66d9ef", "#e6db74", "#f92672", "#a6e22e", "#ae81ff", "#66d9ef"),
    "nord": ("#88c0d0", "#ebcb8b", "#bf616a", "#a3be8c", "#b48ead", "#81a1c1"),
    "solarized_dark": ("#268bd2", "#b58900", "#dc322f", "#859900", "#d33682", "#2aa198"),
    "dracula": ("#8be9fd", "#f1fa8c", "#ff5555", "#50fa7b", "#bd93f9", "#ff79c6"),
    "github_light": ("#0969da", "#9a6700", "#cf222e", "#1a7f37", "#8250df", "#0969da"),
    "one_dark": ("#61afef", "#e5c07b", "#e06c75", "#98c379", "#c678dd", "#56b6c2"),
    "tokyo_night": ("#7dcfff", "#e0af68", "#f7768e", "#9ece6a", "#bb9af7", "#7aa2f7"),
    "gruvbox_dark": ("#83a598", "#fabd2f", "#fb4934", "#b8bb26", "#d3869b", "#8ec07c"),
    "catppuccin": ("#89dceb", "#f9e2af", "#f38ba8", "#a6e3a1", "#cba6f7", "#89b4fa"),
}

DEFAULT_THEME = "monokai"


def theme_names() -> list:
    return sorted(_PALETTES)


def get_theme(name: Optional[str] = None):
    """Build a rich Theme for `name` (env MMTPU_THEME, default monokai)."""
    from rich.theme import Theme

    key = (name or os.environ.get("MMTPU_THEME") or DEFAULT_THEME).lower()
    if key not in _PALETTES:
        raise ValueError(f"Unknown theme {key!r}. Available: {theme_names()}")
    info, warning, error, success, highlight, heading = _PALETTES[key]
    return Theme(
        {
            "info_prefix": f"bold {info}",
            "warning_prefix": f"bold {warning}",
            "error_prefix": f"bold {error}",
            "success_prefix": f"bold {success}",
            "highlight": f"bold {highlight}",
            "heading": heading,
            "default": "white" if key != "github_light" else "black",
            "dim": "dim",
            "note": f"italic dim {info}",
        }
    )
