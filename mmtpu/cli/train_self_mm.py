"""Self-MM driver: custom epoch loop threading the ManagerState pytree.

Reference flow (train_multimodal.py:146 post_init_with_dataloaders + the
Self_MM train_step): label banks prefilled from the train loader, then the
jitted step refines unimodal labels from epoch 2 on. Regression task over
MOSI/MOSEI (labels_key=regression_labels)."""

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
    ds = loaders["train"].dataset
    model = common.build_model_from_config(cfg.model)
    rng = jax.random.PRNGKey(cfg.experiment.seed)

    A = (jnp.asarray(ds.arrays[Modality.AUDIO][:2]), None)
    V = (jnp.asarray(ds.arrays[Modality.VIDEO][:2]), None)
    T = jnp.asarray(ds.arrays[Modality.TEXT][:2])
    variables = model.init({"params": rng, "dropout": rng}, A, V, T, train=False)
    state = common.make_state(
        model, variables["params"], variables.get("batch_stats", {}), cfg.training
    )

    dims = {
        "multimodal": int(cfg.model.kwargs["post_fusion_dim"]),
        "audio": int(cfg.model.kwargs["post_audio_dim"]),
        "video": int(cfg.model.kwargs["post_video_dim"]),
        "text": int(cfg.model.kwargs["post_text_dim"]),
    }
    managers = ManagerState.create(ds.num_samples, dims)
    managers = init_manager_labels(managers, loaders["train"])

    task = SelfMMTask(
        model=model,
        need_data_aligned=bool(cfg.model.kwargs.get("need_data_aligned", False)),
        H=float(cfg.model.kwargs.get("H", 3.0)),
    )
    mesh = common.resolve_mesh(cfg, args)
    train_step = make_self_mm_train_step(task)
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

    epoch_metrics = []
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
        train_metrics = flatten_leaves(recorder.calculate_all_groups(epoch=epoch))

        recorder.reset()
        losses = []
        for batch in DevicePrefetcher(loaders["validation"], mesh=mesh):
            out = eval_step(state, batch)
            losses.append(out["loss"])
            recorder.update_group_ids(
                group, out["preds"], out["labels"], out["pattern_id"],
                loaders["validation"].pattern_vocab, out.get("sample_mask"),
            )
        val_loss = float(np.mean(jax.device_get(losses)))
        val_metrics = flatten_leaves(recorder.calculate_all_groups(epoch=epoch))

        console.print(
            f"epoch {epoch}/{cfg.training.epochs} — train {train_loss:.4f}, "
            f"val {val_loss:.4f}"
        )
        epoch_metrics.append(
            {
                "epoch": epoch,
                "train": {"loss": train_loss, "timing": {"total_time": train_time},
                          "metrics": train_metrics},
                "validation": {"loss": val_loss, "metrics": val_metrics},
            }
        )
        metrics_path.mkdir(parents=True, exist_ok=True)
        (metrics_path / "epoch_metrics.json").write_text(
            json.dumps(epoch_metrics, indent=4, default=float)
        )
        if early.step(val_loss):
            ckpt.save_checkpoint(state, epoch, val_loss)
        if early.should_stop:
            break
        if lr is not None:
            from mmtpu.train.optim import set_lr_scale

            set_lr_scale(
                state.opt_state,
                lr.step(val_loss if lr.kind == "plateau" else None),
            )
    return 0
