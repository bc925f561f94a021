"""Sanity-check metric JSON artifacts (reference: check_metrics.py).

Scans experiments_output/**/epoch_metrics.json for NaN/missing values and
prints a per-file summary.

Usage: python scripts/check_metrics.py [root=experiments_output]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path


def check(path: Path) -> list[str]:
    problems = []
    try:
        data = json.loads(path.read_text())
    except Exception as e:  # noqa: BLE001
        return [f"unreadable: {e}"]
    for entry in data if isinstance(data, list) else [data]:
        epoch = entry.get("epoch", "?")
        for split in ("train", "validation"):
            sec = entry.get(split, {})
            loss = sec.get("loss")
            if loss is None or (isinstance(loss, float) and math.isnan(loss)):
                problems.append(f"epoch {epoch} {split}: bad loss {loss}")
            for k, v in sec.get("metrics", {}).items():
                if isinstance(v, float) and math.isnan(v):
                    problems.append(f"epoch {epoch} {split}: NaN {k}")
    return problems


def main() -> None:
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("experiments_output")
    total_bad = 0
    for path in sorted(root.glob("**/epoch_metrics.json")):
        problems = check(path)
        status = "OK" if not problems else f"{len(problems)} problems"
        print(f"{path}: {status}")
        for p in problems[:5]:
            print(f"   - {p}")
        total_bad += len(problems)
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
