"""Shared helpers (reference: experiment_utils/utils.py).

`format_path_with_env` ($ENV expansion), `SafeDict` partial `.format`,
`flatten_dict`, checkpoint retention, and host/device conversion helpers.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Iterable, Optional

import numpy as np


class SafeDict(dict):
    """Partial str.format support: unknown keys survive as-is."""

    def __missing__(self, key: str) -> str:  # noqa: D105
        return "{" + key + "}"


def format_path_with_env(path: str) -> str:
    """Expand $VAR / ${VAR} with os.environ; unknown vars expand to ''."""

    def _sub(match: "re.Match[str]") -> str:
        var = match.group(1) or match.group(2)
        return os.environ.get(var, "")

    return re.sub(r"\$\{(\w+)\}|\$(\w+)", _sub, str(path))


def flatten_dict(
    d: Dict[str, Any], parent_key: str = "", sep: str = "_"
) -> Dict[str, Any]:
    """Flatten nested dicts: {'a': {'b': 1}} → {'a_b': 1}."""
    items: Dict[str, Any] = {}
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if isinstance(v, dict):
            items.update(flatten_dict(v, key, sep=sep))
        else:
            items[key] = v
    return items


def flatten_leaves(d: Dict[str, Any]) -> Dict[str, Any]:
    """Reference-exact flatten (experiment_utils/utils.py:194-217): the
    reference's flatten_dict DISCARDS parent keys — its prefixing line is
    commented out — so metric-group names never appear in the output schema
    ('accuracy_AI', not 'classification_accuracy_AI'). Colliding leaf keys
    are overwritten in iteration order, as there."""
    out: Dict[str, Any] = {}

    def walk(x: Dict[str, Any]) -> None:
        for k, v in x.items():
            if isinstance(v, dict):
                walk(v)
            else:
                out[str(k)] = v

    walk(d)
    return out


def to_numpy(x: Any) -> np.ndarray:
    """Device array / list → host numpy (one bulk transfer)."""
    return np.asarray(x)


def clean_checkpoints(
    directory: str | Path,
    keep_best: bool = True,
    patterns: Iterable[str] = ("epoch_*.ckpt", "epoch_*.pth"),
    rename_last: bool = True,
) -> int:
    """Retention policy matching the reference's clean_checkpoints
    (experiment_utils/utils.py:293-360): drop per-epoch checkpoints, keep
    `best.*`, optionally rename the newest epoch file to `*_last.*`.

    Returns the number of files removed.
    """
    directory = Path(directory)
    if not directory.exists():
        return 0
    removed = 0
    for pattern in patterns:
        files = sorted(
            # already-renamed *_last files are terminal: re-matching them
            # would cascade renames (epoch_5_last -> epoch_5_last_last ...)
            # on every repeated invocation
            (p for p in directory.glob(pattern)
             if not p.stem.endswith("_last")),
            key=lambda p: p.stat().st_mtime,
        )
        if not files:
            continue
        last = files[-1]
        for f in files[:-1]:
            f.unlink()
            removed += 1
        if rename_last:
            suffix = last.suffix
            last.rename(directory / f"{last.stem}_last{suffix}")
        else:
            last.unlink()
            removed += 1
    if not keep_best:
        # reference keep_best=False drops the best checkpoint too
        # (experiment_utils/utils.py:296,306)
        for best in directory.glob("best.*"):
            if best.suffix in (".ckpt", ".pth", ".json"):
                best.unlink()
                removed += 1
    return removed


def nested_get(d: Dict[str, Any], keys: Iterable[Any], default: Optional[Any] = None) -> Any:
    """Safe nested dict access (reference NestedDictAccess)."""
    cur: Any = d
    for k in keys:
        if isinstance(cur, dict):
            if k not in cur:
                return default
            cur = cur[k]
        else:
            try:
                cur = cur[k]
            except Exception:
                return default
    return cur
