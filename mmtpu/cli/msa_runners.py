"""Drivers for MSA model families with custom training steps (MMIN, RedCore).

The reference routes these through train_multimodal because the models own
their train_step; here each family plugs its step builders into the generic
TrainLoop (reference: train_multimodal.py setup_model_components + the
models' train_step methods)."""

from __future__ import annotations

from pathlib import Path

import jax

from mmtpu.cli import common
from mmtpu.modalities import Modality
from mmtpu.train.loop import TrainLoop
from mmtpu.utils.printing import get_console

console = get_console()

MODS = [Modality.AUDIO, Modality.VIDEO, Modality.TEXT]


def _sample_batch(ds):
    return {
        str(m): jax.numpy.asarray(ds.arrays[m][:2]) for m in MODS if m in ds.arrays
    }


def run(cfg, args, cv_no=None) -> int:
    mt = cfg.model.model_type.lower()
    loaders = cfg.data.build_all_loaders(
        is_train=not args.skip_train, is_test=not args.skip_test,
        seed=cfg.experiment.seed,
    )
    ds = next(iter(loaders.values())).dataset
    model = common.build_model_from_config(cfg.model)
    sb = _sample_batch(ds)
    rng = jax.random.PRNGKey(cfg.experiment.seed)
    rngs = {"params": rng, "dropout": rng, "sample": rng}

    if mt == "mmin":
        variables = model.init(
            rngs, sb["audio"], sb["video"], sb["text"], train=False
        )
    else:  # redcore
        ones = jax.numpy.ones((2,))
        variables = model.init(
            rngs, sb["audio"], sb["video"], sb["text"], ones, ones, ones,
            train=False,
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = common.make_state(model, params, batch_stats, cfg.training,
        clip=cfg.model.kwargs.get("clip") or cfg.model.kwargs.get("grad_clip")
        # MulT spells it clip_grad_norm (reference msa/mult.py:74)
        or cfg.model.kwargs.get("clip_grad_norm"))

    if mt == "mmin":
        from mmtpu.train.mmin_step import (
            MMINTask, make_mmin_eval_step, make_mmin_train_step,
        )

        teacher = teacher_vars = None
        pretrained = cfg.model.kwargs.get("pretrained_model")
        if pretrained is not None and hasattr(pretrained, "build"):
            teacher = pretrained.build()
            tv = teacher.init(
                rngs, sb["audio"], sb["video"], sb["text"], train=False
            )
            path = getattr(teacher, "pretrained_path", None)
            if path:
                from flax import serialization

                from mmtpu.checkpoints.manager import load_pytree
                from mmtpu.utils.utils import SafeDict, format_path_with_env

                from mmtpu.checkpoints.manager import resolve_checkpoint_path

                resolved = resolve_checkpoint_path(
                    format_path_with_env(str(path)).format_map(
                        SafeDict(run_id=args.run_id)
                    )
                )
                raw = load_pytree(resolved)
                restored = {"params": serialization.from_state_dict(
                    tv["params"], raw["params"])}
                if "batch_stats" in tv:
                    # keep the initialized collection even when the
                    # checkpoint carries none — teacher.apply requires it
                    restored["batch_stats"] = (
                        serialization.from_state_dict(
                            tv["batch_stats"], raw["batch_stats"])
                        if raw.get("batch_stats") else tv["batch_stats"]
                    )
                tv = restored
                console.success(f"MMIN teacher restored from {resolved}")
            teacher_vars = jax.tree_util.tree_map(jax.lax.stop_gradient, tv)
        task = MMINTask(
            model=model, loss_group=cfg.training.loss_functions,
            teacher_model=teacher, teacher_variables=teacher_vars,
        )
        builders = (make_mmin_train_step, make_mmin_eval_step)
        extra_state = None
    else:
        from mmtpu.train.redcore_step import (
            RedCoreSchedState, RedCoreTask,
            make_redcore_eval_step, make_redcore_train_step,
        )

        task = RedCoreTask(
            model=model, loss_group=cfg.training.loss_functions,
            loss_beta=cfg.model.kwargs.get("loss_beta", 0.95),
            interval_i=cfg.model.kwargs.get("interval_i", 2),
            # every config-tunable knob of the reference loss reaches the
            # step (reference redcore.py:21,39-40) — lambda_one scales the
            # KLD terms, eta_ext the 500-step eta escalation
            eta_ext=cfg.model.kwargs.get("eta_ext", 1.5),
            lambda_one=cfg.model.kwargs.get("lambda_one", 0.0008),
        )
        sched = RedCoreSchedState.create(eta=cfg.model.kwargs.get("eta", 0.001))
        train_builder = make_redcore_train_step

        def make_train(task):
            inner = train_builder(task)
            holder = {"sched": sched}

            def step(state, batch, rng):
                new_state, holder["sched"], out = inner(
                    state, holder["sched"], batch, rng
                )
                return new_state, out

            return step

        builders = (make_train, make_redcore_eval_step)

    group = next(iter(cfg.metrics.groups), "classification")
    loop = TrainLoop(
        task=task, state=state, loaders=loaders,
        mesh=common.resolve_mesh(cfg, args),
        recorder=common.make_recorder(cfg),
        checkpoint_manager=common.make_checkpoint_manager(cfg),
        epochs=cfg.training.epochs,
        save_metric=cfg.logging.save_metric,
        early_stopping=common.make_early_stopping(cfg),
        lr_controller=common.make_lr_controller(cfg.training),
        metrics_path=Path(cfg.logging.metrics_path),
        group_name=group,
        step_builders=builders,
        print_interval=cfg.experiment.train_print_interval_epochs,
    )
    if args.dry_run or cfg.experiment.dry_run:
        console.success("dry run complete")
        return 0
    if not args.skip_train:
        loop.run()
    if not args.skip_test:
        loop.test(splits=[s for s in loaders if s not in ("train", "validation")])
    return 0
