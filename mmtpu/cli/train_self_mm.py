"""Self-MM driver: custom epoch loop threading the ManagerState pytree.

Reference flow (train_multimodal.py:146 post_init_with_dataloaders + the
Self_MM train_step): label banks prefilled from the train loader, then the
jitted step refines unimodal labels from epoch 2 on. Regression task over
MOSI/MOSEI (labels_key=regression_labels). Like the reference's generic
driver, the run ends with a best-checkpoint test phase emitting
{split}_metrics.json and a final {"test": ...} epoch-metrics entry."""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.cli import common
from mmtpu.data.loader import DevicePrefetcher
from mmtpu.modalities import Modality
from mmtpu.train.managers import ManagerState
from mmtpu.train.self_mm_step import (
    SelfMMTask,
    init_manager_labels,
    make_self_mm_eval_step,
    make_self_mm_train_step,
)
from mmtpu.utils.printing import get_console
from mmtpu.utils.utils import flatten_leaves

console = get_console()


def run(cfg, args) -> int:
    loaders = cfg.data.build_all_loaders(
        is_train=not args.skip_train, is_test=not args.skip_test,
        seed=cfg.experiment.seed,
    )
    # model init only needs sample shapes — any built split provides them
    # (--skip-train omits the train loader entirely)
    ds = next(iter(loaders.values())).dataset
    model = common.build_model_from_config(cfg.model)
    rng = jax.random.PRNGKey(cfg.experiment.seed)

    A = (jnp.asarray(ds.arrays[Modality.AUDIO][:2]), None)
    V = (jnp.asarray(ds.arrays[Modality.VIDEO][:2]), None)
    T = jnp.asarray(ds.arrays[Modality.TEXT][:2])
    variables = model.init({"params": rng, "dropout": rng}, A, V, T, train=False)
    state = common.make_state(
        model, variables["params"], variables.get("batch_stats", {}), cfg.training
    )

    task = SelfMMTask(
        model=model,
        need_data_aligned=bool(cfg.model.kwargs.get("need_data_aligned", False)),
        H=float(cfg.model.kwargs.get("H", 3.0)),
    )
    mesh = common.resolve_mesh(cfg, args)
    eval_step = make_self_mm_eval_step(task)
    recorder = common.make_recorder(cfg)
    ckpt = common.make_checkpoint_manager(cfg)
    early = common.make_early_stopping(cfg)
    lr = common.make_lr_controller(cfg.training)
    metrics_path = Path(cfg.logging.metrics_path)
    group = next(iter(cfg.metrics.groups), "regression")

    if args.dry_run or cfg.experiment.dry_run:
        console.success("dry run complete")
        return 0

    from mmtpu.train.loop import resolve_save_target, split_epoch_entry

    epoch_metrics = []
    metrics_history = {"train": [], "validation": []}

    def eval_split(split):
        recorder.reset()
        losses = []
        for batch in DevicePrefetcher(loaders[split], mesh=mesh):
            out = eval_step(state, batch)
            losses.append(out["loss"])
            recorder.update_group_ids(
                group, out["preds"], out["labels"], out["pattern_id"],
                loaders[split].pattern_vocab, out.get("sample_mask"),
            )
        loss = float(np.mean(jax.device_get(losses))) if losses else 0.0
        metrics = flatten_leaves(
            recorder.calculate_all_groups(skip_tensorboard=split == "test")
        )
        metrics["loss"] = loss
        return loss, metrics

    if not args.skip_train:
        dims = {
            "multimodal": int(cfg.model.kwargs["post_fusion_dim"]),
            "audio": int(cfg.model.kwargs["post_audio_dim"]),
            "video": int(cfg.model.kwargs["post_video_dim"]),
            "text": int(cfg.model.kwargs["post_text_dim"]),
        }
        managers = ManagerState.create(loaders["train"].dataset.num_samples, dims)
        managers = init_manager_labels(managers, loaders["train"])
        train_step = make_self_mm_train_step(task)

        for epoch in range(1, cfg.training.epochs + 1):
            recorder.reset()
            t0 = time.time()
            losses = []
            for batch in DevicePrefetcher(loaders["train"], mesh=mesh):
                rng, step_rng = jax.random.split(rng)
                state, managers, out = train_step(
                    state, managers, batch, step_rng, jnp.asarray(epoch)
                )
                losses.append(out["loss"])
                recorder.update_group_ids(
                    group, out["preds"], out["labels"], out["pattern_id"],
                    loaders["train"].pattern_vocab, out.get("sample_mask"),
                )
            train_loss = float(np.mean(jax.device_get(losses)))
            train_time = time.time() - t0
            train_metrics = flatten_leaves(
                recorder.calculate_all_groups(epoch=epoch)
            )

            val_loss, val_metrics = eval_split("validation")

            console.print(
                f"epoch {epoch}/{cfg.training.epochs} — train {train_loss:.4f}, "
                f"val {val_loss:.4f}"
            )
            metrics_history["train"].append({**train_metrics, "loss": train_loss})
            metrics_history["validation"].append(dict(val_metrics))
            epoch_metrics.append(
                {
                    "epoch": epoch,
                    "train": {"loss": train_loss,
                              "timing": {"total_time": train_time},
                              "metrics": train_metrics},
                    "validation": {"loss": val_loss, "metrics": val_metrics},
                }
            )
            metrics_path.mkdir(parents=True, exist_ok=True)
            (metrics_path / "epoch_metrics.json").write_text(
                json.dumps(epoch_metrics, indent=4, default=float)
            )
            # best/early-stopping target follows logging.save_metric like
            # the generic loop — early's min/max mode is derived from it,
            # so feeding raw val_loss under a non-'loss' metric would flip
            # the comparison (best.ckpt would hold the WORST model)
            target = resolve_save_target(val_metrics, cfg.logging.save_metric)
            if early.step(float(target)):
                ckpt.save_checkpoint(state, epoch, float(target))
            if early.should_stop:
                break
            if lr is not None:
                from mmtpu.train.optim import set_lr_scale

                set_lr_scale(
                    state.opt_state,
                    lr.step(val_loss if lr.kind == "plateau" else None),
                )

    # -- test phase (reference generic driver: best restore + test eval) ----
    if not args.skip_test and "test" in loaders:
        try:
            state = ckpt.load_checkpoint(state, "best")
        except FileNotFoundError:
            console.warning("no best checkpoint — testing current params")
        t0 = time.time()
        test_loss, test_metrics = eval_split("test")
        elapsed = time.time() - t0
        console.display_metrics_table(
            "test metrics",
            {k: v for k, v in test_metrics.items()
             if isinstance(v, (int, float))},
        )
        from mmtpu.reports.report import MetricsReport

        MetricsReport(metrics_path).generate(
            metrics_history, {"test": test_metrics}
        )
        entry = {
            "test": split_epoch_entry(
                test_loss, test_metrics, elapsed, len(loaders["test"]),
                "reference",
            )
        }
        entry["test"].pop("metrics", None)  # reference test entry shape
        epoch_metrics.append(entry)
        metrics_path.mkdir(parents=True, exist_ok=True)
        (metrics_path / "epoch_metrics.json").write_text(
            json.dumps(epoch_metrics, indent=4, default=float)
        )
    ckpt.wait()
    return 0
