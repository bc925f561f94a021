"""AVMNIST-specialized training entry point (reference: train_avmnist.py).

Identical to train_multimodal except the `epoch_metrics.json` structure:
every pattern-suffixed metric is nested under its pattern key (AI/A/I),
matching the restructuring at reference train_avmnist.py:595-860 that the
avmnist_comparison post-hoc scripts parse.

    python -m mmtpu.cli.train_avmnist --config X.yaml --run_id N [...]
"""

from __future__ import annotations

import sys

from mmtpu.cli import common, train_multimodal


def main(argv=None) -> int:
    args = common.standard_arg_parser(__doc__).parse_args(argv)
    common.apply_platform(args)
    cfg = common.load_config(args)

    # Route through the generic driver with the AVMNIST JSON nesting
    # (includes the --stacked-folds path, same as train_multimodal).
    return train_multimodal.route(cfg, args, json_nesting="avmnist")


if __name__ == "__main__":
    sys.exit(main())
