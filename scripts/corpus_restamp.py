"""Re-stamp device provenance onto an existing corpus report from each
row's OWN run log (VERDICT r4 #6: the report must prove which device every
row ran on; a full fresh re-run is ~8.2 h of compute, so cached rows are
re-stamped from their preserved evidence instead).

For every row with a preserved log, the device is read from the log
itself: the axon TPU plugin prints its "Platform 'axon'" banner into every
run that actually opened the tunnel; a --cpu run never does. Rows gain
  device_observed  tpu|cpu     (grepped from the log)
  device           = device_observed
  lane             "<label>-restamp"
  restamped_from_log: true
xfail rows (never executed) get explicit n/a provenance. Rows whose log
is missing are left for a fresh lane to re-run (they stay device-less, so
scripts/corpus_smoke.py --resume will NOT skip them).

Usage: python scripts/corpus_restamp.py IN.json OUT.json [--label r4]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys


def restamp(rows, label):
    host = platform.node()
    stamped = {"tpu": 0, "cpu": 0, "xfail": 0, "missing_log": 0,
               "already": 0}
    for r in rows:
        if r.get("device"):
            stamped["already"] += 1
            continue
        if r["status"] == "xfail":
            r.update(device="n/a (xfail, never executed)",
                     device_observed="n/a", lane=f"{label}-restamp",
                     host=host)
            stamped["xfail"] += 1
            continue
        log = r.get("log") or ""
        if not log or not os.path.exists(log):
            stamped["missing_log"] += 1
            continue
        with open(log, errors="replace") as f:
            text = f.read()
        observed = "tpu" if "Platform 'axon'" in text else "cpu"
        r.update(device=observed, device_observed=observed,
                 lane=f"{label}-restamp", host=host,
                 restamped_from_log=True)
        stamped[observed] += 1
    return stamped


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inp")
    ap.add_argument("out")
    ap.add_argument("--label", default="r4")
    args = ap.parse_args()
    rows = json.loads(open(args.inp).read())
    stamped = restamp(rows, args.label)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(stamped))
    if stamped["missing_log"]:
        missing = [r["config"] for r in rows
                   if not r.get("device")]
        print("left for fresh re-run:", missing, file=sys.stderr)


if __name__ == "__main__":
    main()
