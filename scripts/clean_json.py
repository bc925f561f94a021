"""Normalize metric JSON artifacts (reference: clean_json.py).

Rounds floats, drops NaNs, and rewrites files in place (or to --out).

Usage: python scripts/clean_json.py <file-or-dir> [--digits 6]
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path


def clean(obj, digits: int):
    if isinstance(obj, dict):
        return {k: clean(v, digits) for k, v in obj.items()
                if not (isinstance(v, float) and math.isnan(v))}
    if isinstance(obj, list):
        return [clean(v, digits) for v in obj]
    if isinstance(obj, float):
        return round(obj, digits)
    return obj


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--digits", type=int, default=6)
    args = ap.parse_args()
    root = Path(args.path)
    files = [root] if root.is_file() else sorted(root.glob("**/*.json"))
    for f in files:
        try:
            data = json.loads(f.read_text())
        except Exception:  # noqa: BLE001
            continue
        f.write_text(json.dumps(clean(data, args.digits), indent=4))
        print(f"cleaned {f}")


if __name__ == "__main__":
    main()
