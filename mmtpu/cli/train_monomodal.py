"""Monomodal encoder pretraining (reference: train_monomodal.py:887-906).

Wraps the single configured encoder in a linear-head classifier, trains it,
and on every best epoch emits the bare `encoder_{modality}_best.ckpt`
handoff artifact that multimodal finetuning's `pretrained_encoders` consumes
(reference :790-802).

    python -m mmtpu.cli.train_monomodal --config X.yaml --run_id N [--seed S]
"""

from __future__ import annotations

import sys
from pathlib import Path

from mmtpu.cli import common
from mmtpu.models.registry import build_module
from mmtpu.train.loop import TrainLoop
from mmtpu.train.step import ClassificationTask
from mmtpu.utils.printing import get_console

console = get_console()


def main(argv=None) -> int:
    args = common.standard_arg_parser(__doc__).parse_args(argv)
    common.apply_platform(args)
    # no stacking engine here — --stacked-runs K runs the members
    # sequentially (run_n.sh semantics) instead of silently training one
    return common.run_id_sweep(args, _run_one)


def _run_one(args) -> int:
    cfg = common.load_config(args)

    modality = common.infer_monomodal_modality(cfg)
    encoder_spec = _find_encoder_spec(cfg, modality)
    num_classes = common.infer_num_classes(cfg)
    output_dim = _infer_output_dim(cfg, encoder_spec)

    model = build_module(
        "monomodal_encoder",
        encoder=encoder_spec,
        output_dim=output_dim,
        num_classes=num_classes,
    )

    loaders = cfg.data.build_all_loaders(
        is_train=not args.skip_train, is_test=not args.skip_test,
        seed=cfg.experiment.seed,
    )
    any_split = next(iter(loaders.values()))
    params, batch_stats = common.init_model(
        model,
        common.sample_inputs_for(any_split.dataset, [modality]),
        cfg.experiment.seed,
    )
    state = common.make_state(model, params, batch_stats, cfg.training)

    # Monomodal pretraining consumes the UNMASKED modality (the reference
    # prefers batch[f"{mod}_original"], train_monomodal.py:131-134) — the
    # loader's mask still rides along but the task ignores it by reading the
    # raw key only.
    task = MonomodalTask(
        model=model,
        loss_group=cfg.training.loss_functions,
        input_keys=[str(modality)],
    )

    ckpt = common.make_checkpoint_manager(cfg)

    def on_best(state, epoch):
        ckpt.save_encoder(
            state.params["encoder"],
            str(modality),
            state.batch_stats.get("encoder") if state.batch_stats else None,
        )

    group = next(iter(cfg.metrics.groups), "classification")
    mod_upper = str(modality).upper()

    def add_plain_accuracy(metrics):
        # reference train_monomodal also tracks an unsuffixed per-epoch
        # accuracy next to the {metric}_{MODALITY} recorder keys (:252-254)
        if f"accuracy_{mod_upper}" in metrics:
            metrics.setdefault("accuracy", metrics[f"accuracy_{mod_upper}"])
        return metrics

    any_loader = next(iter(loaders.values()))
    loop = TrainLoop(
        task=task,
        state=state,
        mesh=common.resolve_mesh(cfg, args),
        loaders=loaders,
        recorder=common.make_recorder(cfg),
        checkpoint_manager=ckpt,
        epochs=cfg.training.epochs,
        save_metric=cfg.logging.save_metric,
        early_stopping=common.make_early_stopping(cfg),
        lr_controller=common.make_lr_controller(cfg.training),
        metrics_path=Path(cfg.logging.metrics_path),
        group_name=group,
        on_best=on_best,
        print_interval=cfg.experiment.train_print_interval_epochs,
        monitor=common.make_monitor(cfg, resume=getattr(args, "resume", False)),
        # metric keys carry the MODALITY name, not the pattern letter
        # (reference records update_group(modality=str(key)), :242-247)
        vocab_override=[str(modality)] * len(any_loader.pattern_vocab),
        metrics_postprocess=add_plain_accuracy,
        eval_batch_factor=getattr(args, "eval_batch_factor", None),
        resume=getattr(args, "resume", False),
    )

    if args.dry_run or cfg.experiment.dry_run:
        console.success("dry run complete")
        return 0
    results = {}
    if not args.skip_train:
        with common.ProfilerSession(
            getattr(args, "profile", False), cfg.logging.log_path
        ):
            loop.run()
    if not args.skip_test:
        results = loop.test(
            splits=[s for s in loaders if s not in ("train", "validation")]
        )

    from mmtpu.reports import ExperimentReportGenerator

    ExperimentReportGenerator(
        Path(cfg.logging.metrics_path) / "report", cfg.experiment.name
    ).generate_report(
        metrics_history=loop.metrics_history,
        timing_history=loop.timing_history,
        params=loop.state.params,
        test_metrics=results,
    )
    final = Path(cfg.logging.model_output_path) / f"encoder_{modality}_best.ckpt"
    console.success(f"encoder artifact: {final}")
    print(str(final))
    return 0


def _find_encoder_spec(cfg, modality):
    """Reference encoder-detection heuristics (train_monomodal.py:441-482):
    `{modality}_encoder` keys first, then UttFusion-style net{A,V,T} keys,
    then any `*_encoder`/`net*` kwargs entry."""
    kwargs = cfg.model.kwargs
    spec = kwargs.get(f"{modality}_encoder")
    if spec is None:
        net_key = {"audio": "netA", "video": "netV", "text": "netT"}.get(
            str(modality)
        )
        spec = kwargs.get(net_key) if net_key else None
    if spec is None:
        for k, v in kwargs.items():
            if k.endswith("_encoder") or k.startswith("net"):
                spec = v
                break
    if spec is None:
        raise ValueError("No encoder found in configuration")
    return spec


def _infer_output_dim(cfg, encoder_spec) -> int:
    """Reference output-dim heuristics (train_monomodal.py:485-502): spec
    dims, then model-level dims, then model-type fallbacks."""
    if "output_dim" in cfg.model.kwargs:
        return int(cfg.model.kwargs["output_dim"])
    if hasattr(encoder_spec, "kwargs"):
        for k in ("output_dim", "hidden_dim", "hidden_size", "embd_size"):
            if k in encoder_spec.kwargs:
                return int(encoder_spec.kwargs[k])
    if "hidden_dim" in cfg.model.kwargs:
        return int(cfg.model.kwargs["hidden_dim"])
    mt = cfg.model.model_type.lower()
    if "mmimdb" in mt:
        return 512
    if "avmnist" in mt:
        return 128
    if "utt" in mt or "mosi" in mt:
        return 64
    return 128


class MonomodalTask(ClassificationTask):
    """Reads the raw (unmasked) modality."""

    def apply(self, variables, batch, *, train: bool, rngs=None, mutable=False):
        from mmtpu.models.norm import batch_mask

        inputs = [batch[k] for k in self.input_keys]
        # padded tail rows stay out of BatchNorm statistics (models/norm)
        with batch_mask(batch.get("sample_mask")):
            return self.model.apply(
                variables, *inputs, train=train, rngs=rngs, mutable=mutable
            )


if __name__ == "__main__":
    sys.exit(main())
