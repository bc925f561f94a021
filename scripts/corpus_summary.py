"""Summarize a corpus_smoke report.json into a markdown table.

Usage: python scripts/corpus_summary.py [report.json]
Prints per-family counts/wall-time and the slowest/failed configs —
paste-ready for RESULTS.md.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT = REPO / "experiments_output" / "corpus_smoke" / "report.json"


def family(rel: str) -> str:
    parts = rel.split("/")
    if parts[0] == "ch3_experiments":
        return f"ch3/{parts[1]}"
    return parts[0]


def main() -> int:
    report = Path(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT
    rows = json.loads(report.read_text())
    fams: dict[str, dict] = defaultdict(
        lambda: {"ok": 0, "fail": 0, "xfail": 0, "s": 0.0})
    for r in rows:
        f = fams[family(r["config"])]
        st = r["status"]
        f[st if st in ("ok", "xfail") else "fail"] += 1
        f["s"] += r["seconds"]

    print("| family | configs ok | failed | xfail (ref-broken) | wall (min) |")
    print("|---|---|---|---|---|")
    for name in sorted(fams):
        f = fams[name]
        print(f"| {name} | {f['ok']} | {f['fail']} | {f['xfail']} "
              f"| {f['s'] / 60:.1f} |")
    total_s = sum(r["seconds"] for r in rows)
    n_ok = sum(r["status"] == "ok" for r in rows)
    n_xfail = sum(r["status"] == "xfail" for r in rows)
    n_fail = len(rows) - n_ok - n_xfail
    print(f"| **total** | **{n_ok}** | **{n_fail}** | **{n_xfail}** "
          f"| **{total_s / 60:.1f}** |")

    slow = sorted(rows, key=lambda r: -r["seconds"])[:5]
    print("\nSlowest (dominated by one-time XLA compiles, cached for reruns):")
    for r in slow:
        print(f"- {r['seconds']:7.1f}s {r['config']}")
    fails = [r for r in rows if r["status"] not in ("ok", "xfail")]
    if fails:
        print("\nFailures:")
        for r in fails:
            print(f"- rc={r['rc']} {r['config']} ({r['log']})")
    xfails = [r for r in rows if r["status"] == "xfail"]
    if xfails:
        print("\nxfail (train-broken in the reference, evidence in "
              "scripts/corpus_smoke.py TRAIN_BROKEN_IN_REFERENCE):")
        for r in xfails:
            print(f"- {r['config']}: {r.get('reason', '')}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
