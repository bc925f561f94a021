"""Batch inference + serving export over a trained run.

    python -m mmtpu.cli.predict --config X.yaml --run_id N \
        [--checkpoint best|last|epoch_K|/path.ckpt] [--split test] \
        [--out preds.json] [--export model.mmx] [--cpu]

Restores the run's checkpoint, evaluates the requested split through the
same eval-mode forward training used (missing-pattern product included),
and writes one JSON record per (sample, pattern) visit: pattern name,
prediction, label, correctness — plus a per-pattern accuracy summary.
`--export` additionally writes a self-contained serving artifact
(mmtpu.serving.export: StableHLO, cpu+tpu, symbolic batch).

Beyond-reference entry point: MML_Suite has no inference CLI — its only
post-training surface is test-split metrics inside the training drivers.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from mmtpu.cli import common
from mmtpu.utils.printing import get_console

console = get_console()


def arg_parser():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="Path to YAML config")
    p.add_argument("--run_id", type=int, default=1)
    p.add_argument(
        "--checkpoint", default="best",
        help="best | last | epoch_K | explicit checkpoint path",
    )
    p.add_argument("--split", default="test")
    p.add_argument(
        "--out", default=None,
        help="Predictions JSON path (default: "
             "<metrics_path>/predictions_<split>.json)",
    )
    p.add_argument(
        "--export", default=None, metavar="PATH",
        help="Also export a serving artifact (StableHLO, cpu+tpu platforms, "
             "symbolic batch) to PATH",
    )
    p.add_argument("--cpu", action="store_true", help="Force the CPU backend")
    p.add_argument("--data-parallel", dest="data_parallel", type=int,
                   default=None, help=argparse.SUPPRESS)
    p.add_argument("--seed", type=int, default=None)
    # accepted for load_config compatibility; no effect here
    p.add_argument("--dry-run", dest="dry_run", action="store_true",
                   help=argparse.SUPPRESS)
    p.set_defaults(skip_train=False, skip_test=False, disable_monitoring=True)
    return p


def build_task_and_state(cfg, args):
    """Model + task + restored TrainState for inference (mirrors
    train_multimodal.run_single's assembly, without the training services)."""
    from mmtpu.cli.train_multimodal import modalities_for_model
    from mmtpu.train.step import ClassificationTask

    mt = cfg.model.model_type.lower()
    if mt in ("mmin", "redcore", "self-mm", "self_mm"):
        raise SystemExit(
            f"predict: {mt} uses a custom multi-network step; export its "
            "frozen encoders via the training driver instead"
        )
    mods = modalities_for_model(cfg.model.model_type)
    model = common.build_model_from_config(cfg.model)

    # build ONLY the requested split — inference has no reason to pay the
    # decode/memory cost of the other configured splits
    if args.split not in cfg.data.datasets:
        raise SystemExit(
            f"predict: split {args.split!r} not in config data splits "
            f"{sorted(cfg.data.datasets)}"
        )
    loader = cfg.data.build_loader(args.split, seed=cfg.experiment.seed)
    params, batch_stats = common.init_model(
        model, common.sample_inputs_for(loader.dataset, mods),
        cfg.experiment.seed,
    )
    # the restore target's opt_state pytree must match what training built:
    # a clip-configured run's checkpoint carries an extra clip transform in
    # the optax chain, so omitting it here fails from_state_dict
    state = common.make_state(
        model, params, batch_stats, cfg.training,
        clip=cfg.model.kwargs.get("clip") or cfg.model.kwargs.get("grad_clip"),
    )

    ckpt = common.make_checkpoint_manager(cfg)
    state = ckpt.load_checkpoint(state, args.checkpoint)

    task = ClassificationTask(
        model=model,
        loss_group=cfg.training.loss_functions,
        input_keys=[str(m) for m in mods],
        multilabel=mt == "mmimdb",
    )
    return task, state, loader


def predict_split(task, state, loader):
    """Eval-mode predictions over the loader's (pattern × sample) product.

    Returns (records, per-pattern accuracy dict)."""
    from mmtpu.train.step import make_eval_step

    eval_step = make_eval_step(task)
    vocab = loader.pattern_vocab
    records = []
    hits: dict = {}
    totals: dict = {}
    for batch in loader:
        out = eval_step(state, batch)
        preds = np.asarray(out["preds"])
        labels = np.asarray(out["labels"])
        pids = np.asarray(out["pattern_id"])
        keep = np.asarray(out["sample_mask"]).astype(bool)
        for i in np.nonzero(keep)[0]:
            pattern = vocab[int(pids[i])]
            pred = preds[i].tolist()
            label = labels[i].tolist()
            correct = bool(np.all(preds[i] == labels[i]))
            records.append(
                {"pattern": pattern, "pred": pred, "label": label,
                 "correct": correct}
            )
            hits[pattern] = hits.get(pattern, 0) + int(correct)
            totals[pattern] = totals.get(pattern, 0) + 1
    summary = {
        p: round(hits[p] / totals[p], 4) for p in sorted(totals)
    }
    return records, summary


def main(argv=None) -> int:
    args = arg_parser().parse_args(argv)
    common.apply_platform(args)
    cfg = common.load_config(args)
    task, state, loader = build_task_and_state(cfg, args)

    records, summary = predict_split(task, state, loader)
    out_path = Path(
        args.out
        or Path(cfg.logging.metrics_path) / f"predictions_{args.split}.json"
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(
        json.dumps(
            {"split": args.split, "checkpoint": args.checkpoint,
             "accuracy_per_pattern": summary, "predictions": records},
            indent=2,
        )
    )
    console.success(
        f"{len(records)} predictions → {out_path}; per-pattern acc {summary}"
    )

    if args.export:
        from mmtpu.serving import export_task

        example = next(iter(loader))
        example_batch = {k: np.asarray(example[k]) for k in task.input_keys}
        path = export_task(
            task, state.variables, example_batch, args.export,
            extra_meta={"config": str(args.config),
                        "checkpoint": args.checkpoint},
        )
        console.success(f"serving artifact → {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
