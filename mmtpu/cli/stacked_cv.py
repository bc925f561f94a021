"""Stacked training: K member runs advance in ONE compiled program.

Two member kinds share the engine:
- CV folds (`run`, --stacked-folds): the reference (and run_single) trains
  CV folds sequentially (train_multimodal.py:920-1102); members differ by
  the `cv_no` injected into dataset kwargs and write fold_{k}/ outputs.
- Repeat runs (`run_repeat`, --stacked-runs K): the reference's run_n.sh
  loop (run_n.sh:23-27) re-invokes the driver with run_id 1..N; members
  are full per-run_id config loads (so `{run_id}` path templating holds)
  with per-run seeds seed+i — the variation a deterministic framework
  needs where the reference relied on CUDA nondeterminism for run-to-run
  spread. The sequential equivalent is
  `train_multimodal --run_id r --seed (seed+i)` per run, which the
  fallback path (train_multimodal.sequential_runs) reproduces exactly.

At the batch sizes the reference configs use (32-256) a single run
underutilizes the chip per step; vmapping the train step over a leading
member axis multiplies the work per dispatch while keeping each member's
math, data stream, optimizer state, and RNG independent
(mmtpu/train/stacked.py — parity-tested against separate runs).

Per-member outputs keep the sequential schema: epoch_metrics.json,
member-scoped checkpoints, and (CV only) {split}_metrics_agg.json, so
downstream tooling cannot tell which engine produced a run.

Scope: the generic classification families (avmnist/mmimdb/uttfusion/
kinetics-sounds). Early stopping is tracked per member for best-checkpoint
selection but does not stop the stacked program early (all members run the
configured epochs); plateau/other schedulers apply per member via a stacked
lr_scale vector.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.cli import common
from mmtpu.train.loop import (
    _jsonable,
    resolve_save_target,
    split_epoch_entry,
)
from mmtpu.train.stacked import (
    StackedLoaderGroup,
    make_stacked_eval_step,
    make_stacked_train_step,
    stack_states,
    unstack_states,
)
from mmtpu.train.state import TrainState
from mmtpu.train.step import ClassificationTask
from mmtpu.utils.logging import configure_logger, get_logger
from mmtpu.utils.printing import get_console
from mmtpu.utils.utils import flatten_leaves

console = get_console()


def _member_loss(losses: List[np.ndarray], masks: List[np.ndarray],
                 member: int) -> float:
    """Mean loss over the member's REAL steps (padded lockstep steps where
    the member was exhausted carry all-zero sample masks and are excluded).
    `losses`/`masks` are host arrays — run_split fetches the whole epoch in
    one bulk device_get rather than K x steps tiny transfers."""
    ls = np.asarray([l[member] for l in losses])
    valid = np.asarray([float(m[member].sum()) > 0 for m in masks])
    n = max(int(valid.sum()), 1)
    return float(np.sum(ls * valid) / n)


def _make_task(cfg):
    from mmtpu.cli.train_multimodal import modalities_for_model

    mods = modalities_for_model(cfg.model.model_type)
    model = common.build_model_from_config(cfg.model)
    multilabel = cfg.model.model_type.lower() == "mmimdb"
    task = ClassificationTask(
        model=model,
        loss_group=cfg.training.loss_functions,
        input_keys=[str(m) for m in mods],
        multilabel=multilabel,
    )
    return model, mods, task


def _assemble_member(cfg, args, model, mods, do_train, run_id, seed,
                     shared_tx):
    """Build one member's loaders/params/state/services from the
    currently-set cfg paths (same construction path as run_single).
    Returns (state, shared_tx, ctx)."""
    from mmtpu.utils.utils import clean_checkpoints

    cfg.logging.create_directories()
    clean_checkpoints(cfg.logging.model_output_path)
    loaders = cfg.data.build_all_loaders(
        is_train=do_train,
        is_test=cfg.experiment.is_test and not args.skip_test,
        seed=seed,
    )
    params, batch_stats = common.init_model(
        model,
        common.sample_inputs_for(next(iter(loaders.values())).dataset, mods),
        seed,
    )
    params, batch_stats, _ = common.load_pretrained_encoders(
        params, batch_stats, cfg.model.pretrained_encoders,
        cfg.logging, run_id,
    )
    if shared_tx is None:
        # one tx object for every member: the stacked state's static pytree
        # aux data must be identical across members
        state = common.make_state(
            model, params, batch_stats, cfg.training,
            clip=cfg.model.kwargs.get("clip")
            or cfg.model.kwargs.get("grad_clip"),
        )
        shared_tx = state.tx
    else:
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            batch_stats=batch_stats, tx=shared_tx,
        )
    ctx = {
        "loaders": loaders,
        "recorder": common.make_recorder(cfg),
        "ckpt": common.make_checkpoint_manager(cfg),
        "early": common.make_early_stopping(cfg),
        "lr": common.make_lr_controller(cfg.training),
        "metrics_path": Path(cfg.logging.metrics_path),
        "epoch_metrics": [],
        "history": {"train": [], "validation": []},
        "timing": {"train": [], "validation": []},
    }
    return state, shared_tx, ctx


def run(cfg, args, json_nesting: str = "reference") -> int:
    """--stacked-folds: all K CV folds in one program."""
    folds = int(cfg.experiment.cross_validation)
    base_metrics_path = Path(cfg.logging.metrics_path)
    base_model_path = Path(cfg.logging.model_output_path)
    model, mods, task = _make_task(cfg)
    do_train = cfg.experiment.is_train and not getattr(args, "skip_train",
                                                       False)
    states, members, shared_tx = [], [], None
    for fold in range(1, folds + 1):
        cfg.logging.metrics_path = str(base_metrics_path / f"fold_{fold}")
        cfg.logging.model_output_path = str(base_model_path / f"fold_{fold}")
        for ds_cfg in cfg.data.datasets.values():
            ds_cfg.kwargs["cv_no"] = fold
        state, shared_tx, ctx = _assemble_member(
            cfg, args, model, mods, do_train,
            run_id=args.run_id, seed=cfg.experiment.seed,
            shared_tx=shared_tx,
        )
        states.append(state)
        members.append(ctx)
    cfg.logging.metrics_path = str(base_metrics_path)
    cfg.logging.model_output_path = str(base_model_path)
    return _run_stacked(
        cfg, args, task, states, members, json_nesting,
        agg_path=base_metrics_path, unit="fold",
    )


def run_repeat(args, json_nesting: str = "reference") -> int:
    """--stacked-runs K: run_ids run_id..run_id+K-1 in one program, member
    i seeded seed+i (see module docstring). Members come from
    common.derive_member_args — the same recipe the sequential fallback
    uses, so the two can't drift apart."""
    k = int(args.stacked_runs)
    base_run = int(args.run_id)
    cfg0 = None
    states, members, shared_tx = [], [], None
    model = mods = task = None
    for i in range(k):
        sub = common.derive_member_args(args, base_run, i)
        cfg = common.load_config(sub)
        seed = int(cfg.experiment.seed)
        if cfg0 is None:
            cfg0 = cfg
            model, mods, task = _make_task(cfg)
        do_train = cfg.experiment.is_train and not getattr(
            args, "skip_train", False
        )
        state, shared_tx, ctx = _assemble_member(
            cfg, args, model, mods, do_train,
            run_id=sub.run_id, seed=seed, shared_tx=shared_tx,
        )
        states.append(state)
        members.append(ctx)
    # Each member's load_config pointed the global logger at ITS
    # logs/<run_id>/run_<run_id>.log (so per-member assembly lines land in
    # the member's own file) — but the K runs now train as ONE program, so
    # re-point the logger at a sweep-scoped file instead of leaving every
    # training-phase line in the LAST member's log.
    configure_logger(
        cfg0.logging.log_path,
        suffix=f"runs_{base_run}-{base_run + k - 1}_stacked",
    )
    get_logger().info(
        "stacked --stacked-runs sweep: training-phase logs for runs "
        "%d..%d are combined in this file (per-run metrics/checkpoints "
        "stay run_id-scoped)", base_run, base_run + k - 1,
    )
    return _run_stacked(
        cfg0, args, task, states, members, json_nesting,
        agg_path=None, unit="run",
    )


def _run_stacked(cfg, args, task, states, members, json_nesting: str,
                 agg_path: Optional[Path], unit: str) -> int:
    k = len(members)
    group = next(iter(cfg.metrics.groups), "classification")
    do_train = cfg.experiment.is_train and not getattr(args, "skip_train",
                                                       False)

    if args.dry_run or cfg.experiment.dry_run:
        console.success(
            f"dry run complete — {k} {unit}s stacked, state/loaders built"
        )
        return 0

    stacked = stack_states(states)
    train_step = make_stacked_train_step(task, donate=False)
    eval_step = make_stacked_eval_step(task)
    # Mirror TrainLoop's SCAN-path dropout stream (loop.py: rng starts at
    # PRNGKey(0) per loop; the scan path splits an epoch key then
    # chain-splits per step) so stacked == sequential bit-for-bit even with
    # dropout on. Every member's sequential loop starts from the same key.
    # Scope: the streaming path derives step keys differently (chain-split
    # of the loop rng with no per-epoch key), so with dropout ON and a
    # dataset too large for the device-resident scan budget, stacked and
    # sequential use different (equally valid) dropout masks.
    member_rngs = [jax.random.PRNGKey(0) for _ in range(k)]

    def run_split(stacked, split: str, epoch: int, train: bool):
        group_loader = StackedLoaderGroup(
            [c["loaders"][split] for c in members]
        )
        if train:
            epoch_keys = []
            for f in range(k):
                member_rngs[f], e = jax.random.split(member_rngs[f])
                epoch_keys.append(e)
        losses, masks = [], []
        t0 = time.time()
        for step_i, sbatch in enumerate(group_loader):
            sbatch = jax.device_put(sbatch)
            if train:
                step_keys = []
                for f in range(k):
                    epoch_keys[f], sr = jax.random.split(epoch_keys[f])
                    step_keys.append(sr)
                step_rngs = jnp.stack(step_keys)
                stacked, out = train_step(stacked, sbatch, step_rngs)
            else:
                out = eval_step(stacked, sbatch)
            losses.append(out["loss"])
            mask = out.get("sample_mask")
            if mask is None:
                # .shape on the device array — np.asarray here would force
                # a blocking device→host sync EVERY step (a .get default is
                # evaluated eagerly), serializing dispatch and defeating
                # the one-bulk-transfer design below
                mask = jnp.ones(out["loss"].shape + (1,), jnp.float32)
            masks.append(mask)
            for f, c in enumerate(members):
                vocab = c["loaders"][split].pattern_vocab
                c["recorder"].update_group_ids(
                    group,
                    out["preds"][f], out["labels"][f],
                    out["pattern_id"][f] if "pattern_id" in out
                    else np.zeros(out["preds"][f].shape[0],
                                  np.int32),
                    vocab,
                    out["sample_mask"][f] if "sample_mask" in out else None,
                )
        # one bulk transfer for the whole epoch's (steps, K) losses/masks
        # (also syncs the device stream so `elapsed` covers real compute)
        losses, masks = jax.device_get((losses, masks))
        elapsed = time.time() - t0
        per_member = []
        for f, c in enumerate(members):
            loss = _member_loss(losses, masks, f)
            metrics = flatten_leaves(
                c["recorder"].calculate_all_groups(epoch=epoch, loss=loss)
            )
            metrics["loss"] = loss
            c["recorder"].reset()
            per_member.append(metrics)
            if split in c["timing"]:
                c["timing"][split].append(elapsed)
        return stacked, per_member, elapsed

    epochs = cfg.training.epochs if do_train else 0
    for epoch in range(1, epochs + 1):
        stacked, train_m, t_tr = run_split(stacked, "train", epoch, True)
        stacked, val_m, t_va = run_split(stacked, "validation", epoch, False)
        # hoist: one unstack serves every improving member this epoch
        # (slicing the full K-state pytree inside the per-member loop was
        # O(K^2))
        member_states = None
        scales = []
        for f, c in enumerate(members):
            c["history"]["train"].append(dict(train_m[f]))
            c["history"]["validation"].append(dict(val_m[f]))
            n_tr = max(len(c["loaders"]["train"]), 1)
            n_va = max(len(c["loaders"]["validation"]), 1)
            c["epoch_metrics"].append({
                "epoch": epoch,
                "train": split_epoch_entry(
                    train_m[f]["loss"], train_m[f], t_tr, n_tr, json_nesting
                ),
                "validation": split_epoch_entry(
                    val_m[f]["loss"], val_m[f], t_va, n_va, json_nesting
                ),
            })
            (c["metrics_path"]).mkdir(parents=True, exist_ok=True)
            (c["metrics_path"] / "epoch_metrics.json").write_text(
                json.dumps(_jsonable(c["epoch_metrics"]), indent=4)
            )
            # same resolution AND same fail-loudly contract as the
            # sequential loop — a silent fallback to val loss while
            # EarlyStopping stays in the configured metric's mode would
            # invert best-checkpoint selection for max-mode metrics
            target = resolve_save_target(val_m[f], cfg.logging.save_metric)
            if c["early"].step(float(target)):
                if member_states is None:
                    member_states = unstack_states(stacked, k)
                c["ckpt"].save_checkpoint(member_states[f], epoch,
                                          float(target))
            if c["lr"] is not None:
                metric = (val_m[f]["loss"]
                          if c["lr"].kind == "plateau" else None)
                scales.append(c["lr"].step(metric))
            else:
                scales.append(1.0)
        # per-member lr scale: the stacked hyperparam is a (K,) vector the
        # vmapped update consumes member-wise
        hp = getattr(stacked.opt_state, "hyperparams", None)
        if hp is not None and "lr_scale" in hp:
            hp["lr_scale"] = jnp.asarray(
                scales, dtype=np.asarray(hp["lr_scale"]).dtype
            )
        console.print(
            f"epoch {epoch}/{epochs} — {unit} losses "
            f"{[round(m['loss'], 4) for m in train_m]}"
        )

    # -- test: restore each member's best, evaluate stacked -----------------
    member_test: List[Dict[str, Any]] = []
    test_split = next(
        (s for s in members[0]["loaders"]
         if s not in ("train", "validation", "embeddings")), None,
    )
    if test_split is not None:
        restored = []
        final_states = unstack_states(stacked, k)
        for f, c in enumerate(members):
            st = final_states[f]
            try:
                st = c["ckpt"].load_checkpoint(st, "best")
            except FileNotFoundError:
                pass
            restored.append(st)
        stacked = stack_states(restored)
        stacked, test_m, t_te = run_split(stacked, test_split, 0, False)
        for f, c in enumerate(members):
            member_test.append(test_m[f])
            from mmtpu.reports.report import MetricsReport

            MetricsReport(c["metrics_path"]).generate(
                {}, {test_split: test_m[f]}
            )
            if test_split == "test" and json_nesting == "reference":
                # sequential schema: a trailing {"test": ...} entry is
                # appended to each member's epoch_metrics.json
                # (train/loop.py test(); reference train_multimodal.py
                # :828-855 — no 'metrics' catch-all bucket)
                entry = split_epoch_entry(
                    test_m[f]["loss"], test_m[f], t_te,
                    len(c["loaders"][test_split]), json_nesting,
                )
                entry.pop("metrics", None)
                c["epoch_metrics"].append({"test": entry})
                (c["metrics_path"] / "epoch_metrics.json").write_text(
                    json.dumps(_jsonable(c["epoch_metrics"]), indent=4)
                )

    # per-member report files, same as sequential run_single (the reference
    # emits a report per fold/run too): {train,validation,test}_metrics.json,
    # timing.csv, model summary
    report_states = (
        restored if test_split is not None else unstack_states(stacked, k)
    )
    from mmtpu.reports import ExperimentReportGenerator

    for f, c in enumerate(members):
        ExperimentReportGenerator(
            c["metrics_path"] / "report",
            cfg.experiment.name,
            metrics_dir=c["metrics_path"],
        ).generate_report(
            metrics_history=c["history"],
            timing_history=c["timing"],
            params=report_states[f].params,
            test_metrics=(
                {test_split: member_test[f]} if f < len(member_test) else {}
            ),
        )

    if agg_path is not None:
        from mmtpu.cli.train_multimodal import aggregate_cv_metrics

        for name, agg in (
            ("train", aggregate_cv_metrics(
                [c["history"]["train"] for c in members]
            )),
            ("validation", aggregate_cv_metrics(
                [c["history"]["validation"] for c in members]
            )),
            ("test", aggregate_cv_metrics(member_test)),
        ):
            if agg:
                (agg_path / f"{name}_metrics_agg.json").write_text(
                    json.dumps(agg, indent=4)
                )
    console.success(f"stacked training complete: {k} {unit}s in one program")
    return 0
