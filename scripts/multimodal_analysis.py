"""Multi-run significance analysis CLI (reference: multimodal_analysis.py +
experiment_utils/experiment_analyser.py:42).

Compares two experiments' best validation metric across run_ids with
Welch t-test / Mann-Whitney U.

Usage:
  python scripts/multimodal_analysis.py --a <exp_dir_a> --b <exp_dir_b> \
      --metric classification_accuracy_AI [--split validation]
"""

from __future__ import annotations

import argparse
import json

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root: scripts run from anywhere

from mmtpu.analysis.processing import compare_experiments


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="experiment dir A")
    ap.add_argument("--b", required=True, help="experiment dir B")
    ap.add_argument("--metric", required=True)
    ap.add_argument("--split", default="validation")
    args = ap.parse_args()
    print(
        json.dumps(
            compare_experiments(args.a, args.b, args.metric, args.split), indent=2
        )
    )


if __name__ == "__main__":
    main()
