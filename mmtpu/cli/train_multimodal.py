"""Multimodal training entry point (reference: train_multimodal.py:1107-1257).

    python -m mmtpu.cli.train_multimodal --config X.yaml --run_id N \
        [--dry-run --skip-train --skip-test --disable_monitoring --cpu]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from mmtpu.cli import common
from mmtpu.modalities import Modality
from mmtpu.train.loop import TrainLoop
from mmtpu.train.step import ClassificationTask
from mmtpu.utils.printing import get_console
from mmtpu.utils.utils import clean_checkpoints

console = get_console()


def modalities_for_model(model_type: str):
    mt = model_type.lower()
    if mt in ("avmnist", "kineticssounds"):
        return [Modality.AUDIO, Modality.IMAGE] if mt == "avmnist" else [
            Modality.AUDIO, Modality.VIDEO,
        ]
    if mt == "mmimdb":
        return [Modality.IMAGE, Modality.TEXT]
    if mt in ("utt-fusion", "utt_fusion", "uttfusionmodel", "self-mm",
              "mmin", "redcore"):
        return [Modality.AUDIO, Modality.VIDEO, Modality.TEXT]
    raise ValueError(f"Unknown model type: {model_type}")


def route(cfg, args, json_nesting: str = "reference") -> int:
    """Dispatch to single-run / sequential-CV / stacked-CV / stacked-runs.
    Shared by train_multimodal and train_avmnist (which only differs in
    nesting)."""
    runs = int(getattr(args, "stacked_runs", 0) or 0)
    if runs > 1 and not cfg.experiment.cross_validation:
        mt = cfg.model.model_type.lower()
        dp = getattr(args, "data_parallel", None)
        if dp is None:
            dp = getattr(cfg.experiment, "data_parallel", None)
        reason = None
        if mt in ("mmin", "redcore", "self-mm", "self_mm"):
            reason = f"--stacked-runs unsupported for {mt}"
        elif dp and dp != 1:
            reason = (
                "--stacked-runs is single-device and data_parallel="
                f"{dp} was requested"
            )
        elif getattr(args, "resume", False):
            reason = "--resume is not supported by --stacked-runs"
        if reason is None:
            from mmtpu.cli import stacked_cv

            return stacked_cv.run_repeat(args, json_nesting=json_nesting)
        console.warning(f"{reason}; falling back to sequential runs")
        return sequential_runs(args, runs, json_nesting=json_nesting)
    if runs > 1:
        # cross-validation has no run-stacking engine (the vmap axis is
        # already folds) — but the user still asked for K repeats, so run
        # them sequentially like run_n.sh rather than dropping K-1 runs.
        console.warning(
            "--stacked-runs with a cross-validation config runs the "
            f"{runs} repeats sequentially (use --stacked-folds to stack "
            "folds within each run)"
        )
        return sequential_runs(args, runs, json_nesting=json_nesting)
    if cfg.experiment.cross_validation:
        if getattr(args, "stacked_folds", False):
            mt = cfg.model.model_type.lower()
            dp = getattr(args, "data_parallel", None)
            if dp is None:
                dp = getattr(cfg.experiment, "data_parallel", None)
            if mt in ("mmin", "redcore", "self-mm", "self_mm"):
                console.warning(
                    f"--stacked-folds unsupported for {mt}; "
                    "falling back to sequential CV"
                )
            elif dp and dp != 1:
                # the stacked engine is a single-device program (vmap over
                # folds); honoring the requested mesh matters more than
                # stacking, so fall back to sequential CV which shards
                console.warning(
                    "--stacked-folds is single-device and data_parallel="
                    f"{dp} was requested; falling back to sequential CV "
                    "on the mesh"
                )
            elif getattr(args, "resume", False):
                # the stacked engine has no mid-run resume point; honoring
                # --resume (continue the interrupted run) matters more than
                # stacking, so fall back to sequential CV which resumes
                # each fold from its rolling last.ckpt
                console.warning(
                    "--resume is not supported by --stacked-folds; "
                    "falling back to sequential CV, which resumes per fold"
                )
            else:
                from mmtpu.cli import stacked_cv

                return stacked_cv.run(cfg, args, json_nesting=json_nesting)
        return main_cross_validation(cfg, args, json_nesting=json_nesting)
    return run_single(cfg, args, json_nesting=json_nesting)


def sequential_runs(args, runs: int, json_nesting: str = "reference") -> int:
    """--stacked-runs fallback when stacking can't apply (CV config,
    custom-step model, data_parallel mesh, --resume): the reference's
    run_n.sh loop (run_n.sh:23-27) — invoke the driver once per run_id,
    members derived by the SAME recipe as the stacked engine
    (common.derive_member_args) so the outputs match it, aborting the
    sweep on the first failure like the reference script."""
    base_run = int(args.run_id)
    for i in range(runs):
        sub = common.derive_member_args(args, base_run, i)
        console.rule(f"run {sub.run_id} ({i + 1}/{runs})")
        cfg = common.load_config(sub)
        rc = route(cfg, sub, json_nesting=json_nesting)
        if rc != 0:
            return rc
    return 0


def main(argv=None) -> int:
    args = common.standard_arg_parser(__doc__).parse_args(argv)
    common.apply_platform(args)
    cfg = common.load_config(args)
    return route(cfg, args)


def run_single(cfg, args, cv_no=None, json_nesting="reference", collect=None) -> int:
    """Train/test one run. `json_nesting` selects the epoch_metrics.json
    style ('reference' or 'avmnist'); `collect`, when a dict, receives the
    per-epoch metrics histories and test metrics for CV aggregation."""
    if cv_no is not None:
        # reference main_cross_validation injects the fold number into every
        # dataset's kwargs (train_multimodal.py:947) — BEFORE dispatching to
        # the custom-step runners, whose loaders also build from cfg.data
        # (otherwise every "fold" of an MMIN/RedCore/Self-MM CV would train
        # on the default fold's data)
        for ds_cfg in cfg.data.datasets.values():
            ds_cfg.kwargs["cv_no"] = cv_no
    mt = cfg.model.model_type.lower()
    if mt in ("mmin", "redcore"):
        from mmtpu.cli import msa_runners

        return msa_runners.run(cfg, args, cv_no=cv_no)
    if mt in ("self-mm", "self_mm"):
        from mmtpu.cli import train_self_mm

        return train_self_mm.run(cfg, args)
    clean_checkpoints(cfg.logging.model_output_path)
    loaders = cfg.data.build_all_loaders(
        is_train=cfg.experiment.is_train and not args.skip_train,
        is_test=cfg.experiment.is_test and not args.skip_test,
        seed=cfg.experiment.seed,
    )
    mods = modalities_for_model(cfg.model.model_type)
    model = common.build_model_from_config(cfg.model)

    any_split = next(iter(loaders.values()))
    params, batch_stats = common.init_model(
        model,
        common.sample_inputs_for(any_split.dataset, mods),
        cfg.experiment.seed,
    )
    params, batch_stats, loaded = common.load_pretrained_encoders(
        params, batch_stats, cfg.model.pretrained_encoders, cfg.logging, args.run_id
    )
    state = common.make_state(model, params, batch_stats, cfg.training,
        clip=cfg.model.kwargs.get("clip") or cfg.model.kwargs.get("grad_clip")
        # MulT spells it clip_grad_norm (reference msa/mult.py:74)
        or cfg.model.kwargs.get("clip_grad_norm"))

    multilabel = cfg.model.model_type.lower() == "mmimdb"
    task = ClassificationTask(
        model=model,
        loss_group=cfg.training.loss_functions,
        input_keys=[str(m) for m in mods],
        multilabel=multilabel,
    )

    group = next(iter(cfg.metrics.groups), "classification")
    loop = TrainLoop(
        task=task,
        state=state,
        mesh=common.resolve_mesh(cfg, args),
        loaders=loaders,
        recorder=common.make_recorder(cfg),
        checkpoint_manager=common.make_checkpoint_manager(cfg),
        epochs=cfg.training.epochs,
        save_metric=cfg.logging.save_metric,
        early_stopping=common.make_early_stopping(cfg),
        lr_controller=common.make_lr_controller(cfg.training),
        metrics_path=Path(cfg.logging.metrics_path),
        group_name=group,
        print_interval=cfg.experiment.train_print_interval_epochs,
        monitor=common.make_monitor(cfg, resume=getattr(args, "resume", False)),
        json_nesting=json_nesting,
        run_id=args.run_id,
        eval_batch_factor=getattr(args, "eval_batch_factor", None),
        resume=getattr(args, "resume", False),
    )

    if args.dry_run or cfg.experiment.dry_run:
        console.success("dry run complete — config, data, model, state all built")
        return 0

    results = {}
    if not args.skip_train and cfg.experiment.is_train:
        with common.ProfilerSession(
            getattr(args, "profile", False), cfg.logging.log_path
        ):
            best = loop.run()
        console.success(f"training done; best: { {k: v for k, v in list(best.items())[:4]} }")

    if not args.skip_test and cfg.experiment.is_test:
        results = loop.test(
            splits=[s for s in loaders if s not in ("train", "validation", "embeddings")]
        )
        for split, metrics in results.items():
            console.display_metrics_table(
                f"{split} metrics",
                {k: v for k, v in metrics.items() if isinstance(v, (int, float))},
            )

    # embeddings export for configured 'embeddings' split (reference :1176-1215)
    embeddings_dir = None
    if "embeddings" in loaders and hasattr(model, "encode"):
        embeddings_dir = _export_embeddings(
            cfg, model, loop.state, loaders["embeddings"], mods
        )

    from mmtpu.reports import ExperimentReportGenerator

    ExperimentReportGenerator(
        Path(cfg.logging.metrics_path) / "report",
        cfg.experiment.name,
        metrics_dir=cfg.logging.metrics_path,
    ).generate_report(
        metrics_history=loop.metrics_history,
        timing_history=loop.timing_history,
        params=loop.state.params,
        test_metrics=results,
        embeddings_dir=embeddings_dir,
    )
    if collect is not None:
        collect["train"] = loop.metrics_history["train"]
        collect["validation"] = loop.metrics_history["validation"]
        collect["test"] = results.get("test", {})
    return 0


def aggregate_cv_metrics(fold_metrics):
    """Mean of every numeric metric per epoch across folds (reference:
    train_multimodal.py:1037-1083 aggregate_cv_metrics). Accepts either a
    list-of-epoch-dicts per fold or a single dict per fold (test metrics)."""
    if not fold_metrics:
        return []
    if isinstance(fold_metrics[0], dict):
        fold_metrics = [[m] for m in fold_metrics]
    n_epochs = min(len(fold) for fold in fold_metrics)
    aggregated = []
    for e in range(n_epochs):
        values = {}
        for fold in fold_metrics:
            for name, v in fold[e].items():
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    values.setdefault(name, []).append(v)
        aggregated.append({k: float(np.mean(v)) for k, v in values.items()})
    return aggregated


def main_cross_validation(cfg, args, json_nesting="reference") -> int:
    """K-fold driver (reference: train_multimodal.py:920-1102): run each
    fold with fold-scoped output dirs, then aggregate per-epoch means of
    every metric into {train,validation,test}_metrics_agg.json."""
    folds = int(cfg.experiment.cross_validation)
    base_metrics_path = Path(cfg.logging.metrics_path)
    base_model_path = Path(cfg.logging.model_output_path)
    fold_train, fold_val, fold_test = [], [], []
    for fold in range(1, folds + 1):
        console.rule(f"fold {fold}/{folds}")
        cfg.logging.metrics_path = str(base_metrics_path / f"fold_{fold}")
        cfg.logging.model_output_path = str(base_model_path / f"fold_{fold}")
        cfg.logging.create_directories()
        collected = {}
        run_single(cfg, args, cv_no=fold, json_nesting=json_nesting,
                   collect=collected)
        if collected.get("train"):
            fold_train.append(collected["train"])
            fold_val.append(collected["validation"])
        if collected.get("test"):
            fold_test.append(collected["test"])

    for name, agg in (
        ("train", aggregate_cv_metrics(fold_train)),
        ("validation", aggregate_cv_metrics(fold_val)),
        ("test", aggregate_cv_metrics(fold_test)),
    ):
        if agg:
            (base_metrics_path / f"{name}_metrics_agg.json").write_text(
                json.dumps(agg, indent=4)
            )
    cfg.logging.metrics_path = str(base_metrics_path)
    cfg.logging.model_output_path = str(base_model_path)
    return 0


def _export_embeddings(cfg, model, state, loader, mods) -> None:
    import jax

    out_dir = Path(cfg.logging.metrics_path) / "embeddings"
    out_dir.mkdir(parents=True, exist_ok=True)
    full = loader.dataset.get_full_modality()
    vocab = loader.pattern_vocab
    chunks = {str(m): [] for m in mods}
    labels = []

    @jax.jit
    def encode(variables, *inputs):
        return model.apply(variables, *inputs, train=False, method=model.encode)

    for batch in loader:
        keep = np.asarray(batch["sample_mask"]).astype(bool)
        pat_ok = np.asarray(
            [vocab[i] == full for i in np.asarray(batch["pattern_id"])]
        )
        keep &= pat_ok
        if not keep.any():
            continue
        outs = encode(state.variables, *[batch[str(m)] for m in mods])
        for m, o in zip(mods, outs):
            chunks[str(m)].append(np.asarray(o)[keep])
        labels.append(np.asarray(batch["labels"])[keep])
    for m in mods:
        if chunks[str(m)]:
            np.save(out_dir / f"{m}_embeddings.npy", np.concatenate(chunks[str(m)]))
    if labels:
        np.save(out_dir / "labels.npy", np.concatenate(labels))
    console.success(f"embeddings exported to {out_dir}")
    return out_dir


if __name__ == "__main__":
    sys.exit(main())
