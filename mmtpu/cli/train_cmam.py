"""CMAM training entry point (reference: train_cmam.py:127-1024).

Builds the frozen base model from config.model (restoring its
`pretrained_path` checkpoint), the CMAM from config.cmam, copies the base
encoders' states into the CMAM input encoders when requested
(train_cmam.py:226-236), and runs the frozen-teacher loop with
classification + reconstruction metric groups.

    python -m mmtpu.cli.train_cmam --config X.yaml --run_id N [...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import numpy as np

from mmtpu.cli import common
from mmtpu.cli.train_multimodal import modalities_for_model
from mmtpu.config.cmam import CMAMConfig
from mmtpu.modalities import Modality
from mmtpu.train.cmam_loss import CMAMLoss
from mmtpu.train.cmam_step import CMAMTask, make_cmam_eval_step, make_cmam_train_step
from mmtpu.train.loop import TrainLoop
from mmtpu.utils.printing import get_console

console = get_console()


def main(argv=None) -> int:
    parser = common.standard_arg_parser(__doc__)
    parser.add_argument(
        "--export-serving", "--export_serving", dest="export_serving",
        default=None, metavar="PATH",
        help="After training/test, export the (best-checkpoint) CMAM + "
             "frozen base as ONE missing-modality serving artifact "
             "(mmtpu.serving.export_cmam: available modalities in → "
             "imputed embedding + class scores out)",
    )
    args = parser.parse_args(argv)
    common.apply_platform(args)
    # no stacking engine here — --stacked-runs K runs the members
    # sequentially (run_n.sh semantics) instead of silently training one
    return common.run_id_sweep(args, _run_one)


def _run_one(args) -> int:
    cfg = CMAMConfig.load(args.config, run_id=args.run_id)
    common.finalize_config(cfg, args)

    loaders = cfg.data.build_all_loaders(
        is_train=not args.skip_train, is_test=not args.skip_test,
        seed=cfg.experiment.seed,
    )
    any_split = next(iter(loaders.values()))
    ds = any_split.dataset

    # -- frozen base model ---------------------------------------------------
    base_mods = modalities_for_model(cfg.model.model_type)
    base_model = common.build_model_from_config(cfg.model)
    base_params, base_stats = common.init_model(
        base_model, common.sample_inputs_for(ds, base_mods), cfg.experiment.seed
    )
    base_variables = {"params": base_params}
    if base_stats:
        base_variables["batch_stats"] = base_stats
    if cfg.model.pretrained_path:
        from mmtpu.checkpoints.manager import load_model_variables

        # handles mmtpu .ckpt, reference torch .pth (interop reader), and
        # cross-layout LSTM bases — not just msgpack at the exact path
        params_r, stats_r = load_model_variables(
            cfg.model.pretrained_path, base_params,
            base_stats if base_stats else None,
        )
        base_variables["params"] = params_r
        if stats_r is not None:
            base_variables["batch_stats"] = stats_r
        console.success(f"restored base model from {cfg.model.pretrained_path}")
    base_variables = jax.tree_util.tree_map(
        jax.lax.stop_gradient, base_variables
    )

    # -- CMAM -----------------------------------------------------------------
    is_dual = cfg.cmam.model_type.lower() in ("dual_cmam", "dualcmam")
    target_modality = str(
        Modality(str(cfg.cmam.kwargs.get("target_modality",
                 cfg.cmam.kwargs.get("target_modality_one",
                 cfg.target_modality))))
    )
    cmam_model = common.build_model_from_config(cfg.cmam)
    rng = jax.random.PRNGKey(cfg.experiment.seed)
    if is_dual:
        input_mods = [str(Modality(str(cmam_model.input_modality)))]
        sample_inputs = ds.arrays[Modality(input_mods[0])][:2]
    else:
        input_mods = sorted(
            str(Modality(str(k))) for k in cmam_model.input_encoders
        )
        sample_inputs = {m: ds.arrays[Modality(m)][:2] for m in input_mods}
    variables = cmam_model.init({"params": rng, "dropout": rng}, sample_inputs,
                                train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # copy base encoder states into CMAM input encoders when requested
    params = dict(params)
    for mod in cfg.cmam.kwargs.get("load_pretrained_encoder_state_for") or ():
        mod = str(Modality(str(mod)))
        enc_key = f"{mod}_encoder"
        # linen's dict-submodule naming; DualCMAM has one encoder submodule
        cmam_key = "encoder" if is_dual else f"input_encoders_{mod}"
        if enc_key in base_variables["params"] and cmam_key in params:
            params[cmam_key] = base_variables["params"][enc_key]
            console.success(f"copied base {mod} encoder state into CMAM")
        else:
            console.warning(
                f"could not copy base {mod} encoder into CMAM "
                f"({enc_key} -> {cmam_key})"
            )

    # optimizer over CMAM params only (reference :208)
    state = common.make_state(cmam_model, params, batch_stats, cfg.training,
        clip=cfg.cmam.kwargs.get("clip") or cfg.cmam.kwargs.get("grad_clip"))

    loss_terms = cfg.training.loss_functions
    cmam_term = next(
        (t for t in loss_terms.values() if isinstance(t.loss_fn, CMAMLoss)), None
    )
    loss = cmam_term.loss_fn if cmam_term else CMAMLoss()

    # predictions follow the BASE model's logits_transform (reference
    # cmams.py:239-243): multilabel sigmoid+threshold for MM-IMDb
    multilabel = cfg.model.model_type.lower() == "mmimdb"
    binary_threshold = float(cfg.model.kwargs.get("binary_threshold", 0.5))

    if is_dual:
        from mmtpu.train.cmam_step import (
            DualCMAMTask,
            make_dual_cmam_eval_step,
            make_dual_cmam_train_step,
        )

        task = DualCMAMTask(
            cmam_model=cmam_model,
            base_model=base_model,
            base_variables=base_variables,
            base_model_type=cfg.model.model_type,
            input_modalities=input_mods,
            target_modality=str(
                Modality(str(cmam_model.target_modality_one))
            ),
            target_modality_two=str(
                Modality(str(cmam_model.target_modality_two))
            ),
            loss=loss,
            labels_key="labels",
            multilabel=multilabel,
            binary_threshold=binary_threshold,
        )
        step_builders = (make_dual_cmam_train_step, make_dual_cmam_eval_step)
    else:
        task = CMAMTask(
            cmam_model=cmam_model,
            base_model=base_model,
            base_variables=base_variables,
            base_model_type=cfg.model.model_type,
            input_modalities=input_mods,
            target_modality=target_modality,
            loss=loss,
            labels_key="labels",
            multilabel=multilabel,
            binary_threshold=binary_threshold,
        )
        step_builders = (make_cmam_train_step, make_cmam_eval_step)

    def record(recorder, out, vocab):
        pid = out.get("pattern_id")
        if pid is None:
            pid = np.zeros(np.asarray(out["labels"]).shape[0], np.int32)
        if "preds" in out and "classification" in recorder.config.groups:
            recorder.update_group_ids(
                "classification", out["preds"], out["labels"], pid, vocab,
                out.get("sample_mask"),
            )
        if "reconstruction" in recorder.config.groups:
            recorder.update_group_ids(
                "reconstruction", out["rec_embd"], out["target_embd"], pid, vocab,
                out.get("sample_mask"),
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
        record_fn=record,
        step_builders=step_builders,
        print_interval=cfg.experiment.train_print_interval_epochs,
        resume=getattr(args, "resume", False),
    )

    if args.dry_run or cfg.experiment.dry_run:
        console.success("dry run complete")
        return 0
    if not args.skip_train:
        loop.run()
    if not args.skip_test:
        # return value unused: the report below reads the nested copies
        # the loop keeps (test_metrics_nested)
        loop.test(
            splits=[s for s in loaders if s not in ("train", "validation")]
        )

    if args.export_serving:
        try:
            loop.state = loop.ckpt.load_checkpoint(loop.state, "best")
        except FileNotFoundError:
            console.warning("no best checkpoint — exporting current params")
        from mmtpu.serving import export_cmam

        example = next(iter(any_split))
        example_batch = {
            m: np.asarray(example[m]) for m in task.input_modalities
        }
        cmam_vars = {"params": loop.state.params}
        if loop.state.batch_stats:
            cmam_vars["batch_stats"] = loop.state.batch_stats
        out_path = export_cmam(
            task, cmam_vars, example_batch, args.export_serving,
            extra_meta={"config": str(args.config)},
        )
        console.success(f"missing-modality serving artifact → {out_path}")

    # final report emits {train,validation,test}_metrics.json in the
    # reference record schema: nested group dicts + loss + per-term
    # cosine/mae/mse columns (reference train_cmam.py:532-560,988)
    from mmtpu.reports import ExperimentReportGenerator

    ExperimentReportGenerator(
        Path(cfg.logging.metrics_path) / "report",
        cfg.experiment.name,
        metrics_dir=cfg.logging.metrics_path,
    ).generate_report(
        metrics_history=loop.metrics_history_nested,
        timing_history=loop.timing_history,
        params=loop.state.params,
        test_metrics=loop.test_metrics_nested,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
