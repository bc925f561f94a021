"""Shared experiment assembly for the training CLIs.

Reference counterparts: train_multimodal.py `setup_experiment`/`main` (:75,
:1107), `setup_model_components` (:127 — model build, pretrained-encoder
loads :156-204, per-encoder optimizer param groups :216-305),
`setup_dataloaders`, and the CLI flag surface (:1229-1257).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from mmtpu.checkpoints.manager import CheckpointManager, load_encoder_checkpoint
from mmtpu.config import StandardMultimodalConfig
from mmtpu.config.training import TrainingConfig
from mmtpu.models.registry import build_module
from mmtpu.modalities import Modality
from mmtpu.train.early_stopping import EarlyStopping, mode_for_metric
from mmtpu.train.optim import LRController, build_optimizer
from mmtpu.train.recorder import MetricRecorder
from mmtpu.train.state import TrainState
from mmtpu.utils.logging import configure_logger, get_logger
from mmtpu.utils.printing import get_console

console = get_console()


def standard_arg_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, help="Path to YAML config")
    p.add_argument("--run_id", type=int, default=1)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dry-run", "--dry_run", dest="dry_run", action="store_true")
    p.add_argument("--skip-train", dest="skip_train", action="store_true")
    p.add_argument("--skip-test", dest="skip_test", action="store_true")
    p.add_argument(
        "--disable_monitoring", "--disable-monitoring",
        dest="disable_monitoring", action="store_true",
    )
    p.add_argument("--cpu", action="store_true", help="Force the CPU backend")
    p.add_argument(
        "--data-parallel", "--data_parallel", dest="data_parallel",
        type=int, default=None, metavar="N",
        help="Shard batches over an N-device mesh (-1 = all devices; "
             "overrides experiment.data_parallel)",
    )
    p.add_argument(
        "--profile", action="store_true",
        help="Capture a JAX profiler trace of the first training epochs "
             "into <log_path>/profile (view with TensorBoard)",
    )
    p.add_argument(
        "--eval-batch-factor", "--eval_batch_factor",
        dest="eval_batch_factor", type=int, default=None, metavar="N",
        help="Device-resident eval only: fuse the patterns x samples eval "
             "product into N-x larger batches — more MXU work per dispatch "
             "at small batch sizes. Bit-identical to unfused eval at any N "
             "(losses are reduced per original batch inside the fused "
             "dispatch). Default: auto — grow fused batches toward ~1024 "
             "rows. Pass 1 to disable fusion.",
    )
    p.add_argument(
        "--epochs", type=int, default=None, metavar="N",
        help="Override training.epochs from the command line (smoke runs, "
             "quick iteration) without editing the YAML",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="Continue a previously interrupted run from its rolling "
             "last.ckpt/resume.json (written every epoch). The resumed run "
             "is bit-identical to an uninterrupted one: RNG stream, "
             "epoch-seeded schedules, optimizer moments, LR scale, and "
             "early-stopping counters all restore exactly.",
    )
    p.add_argument(
        "--stacked-folds", "--stacked_folds", dest="stacked_folds",
        action="store_true",
        help="Cross-validation only: train ALL folds simultaneously in one "
             "vmapped program (per-fold math unchanged; early stopping "
             "tracked per fold for checkpoints but folds run full epochs)",
    )
    p.add_argument(
        "--stacked-runs", "--stacked_runs", dest="stacked_runs",
        type=int, default=0, metavar="K",
        help="Train K repeat runs (run_id..run_id+K-1, member i seeded "
             "seed+i) simultaneously in one vmapped program — the stacked "
             "equivalent of the reference's run_n.sh sweep loop. Each run "
             "writes its own run_id-scoped outputs, matching K sequential "
             "driver invocations (bit-identical on the device-resident "
             "scan path; with dropout ON and a streaming-path dataset the "
             "dropout streams differ — see mmtpu/cli/stacked_cv.py). "
             "Drivers/configs without a stacking engine (CV configs, "
             "train_monomodal, train_cmam, custom-step models, data "
             "parallelism, --resume) run the K members sequentially.",
    )
    return p


class ProfilerSession:
    """JAX profiler trace around the training phase (SURVEY §5.1: the
    reference has only wall-clock phase timing; the TPU mapping is a real
    step-level trace)."""

    def __init__(self, enabled: bool, log_path: str) -> None:
        self.enabled = enabled
        self.dir = str(Path(log_path) / "profile")

    def __enter__(self):
        if self.enabled:
            import jax

            Path(self.dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            get_logger().info(f"profiler trace -> {self.dir}")
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import jax

            jax.profiler.stop_trace()
        return False


def apply_platform(args) -> None:
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    _apply_compilation_cache()


def _apply_compilation_cache() -> None:
    """Honor JAX_COMPILATION_CACHE_DIR in CLI processes, host-keying it for
    CPU backends (a CPU backend must never read an unkeyed directory other
    hosts write — cross-host XLA:CPU AOT entries risk SIGILL; see
    mmtpu/utils/compile_cache.py). No-op when the var is unset."""
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        from mmtpu.utils import compile_cache

        compile_cache.enable_env_dir(
            cache_dir,
            min_compile_time_secs=float(
                os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 0.0)
            ),
            min_entry_size_bytes=int(
                os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", -1)
            ),
        )


_PRECISION_MAP = {
    "bf16": "bfloat16",
    "bfloat16": "bfloat16",
    "tf32": "tensorfloat32",
    "f32": "float32",
    "float32": "float32",
    "highest": "highest",
}


def apply_precision(cfg) -> None:
    p = getattr(cfg.experiment, "precision", None)
    if p:
        jax.config.update("jax_default_matmul_precision", _PRECISION_MAP[p.lower()])


def resolve_mesh(cfg, args=None):
    """experiment.data_parallel / --data-parallel → device Mesh (or None).

    The reference is strictly single-device (SURVEY §2.2); this is the
    TPU-native scaling path: batches sharded over the mesh 'data' axis,
    parameters replicated, gradient all-reduce inserted by XLA over ICI.
    Every configured batch_size must divide evenly over the axis.
    """
    dp = getattr(args, "data_parallel", None) if args is not None else None
    if dp is None:
        dp = getattr(cfg.experiment, "data_parallel", None)
    if not dp:
        return None
    if dp < -1:
        raise ValueError(f"data_parallel={dp}: use -1 (all devices) or N >= 1")
    n = jax.device_count()
    if dp == -1:
        dp = n
    if dp == 1:
        # a 1-device mesh buys nothing and would disable the device-resident
        # scan fast path — resolve to single-device mode
        return None
    if dp > n:
        raise ValueError(f"data_parallel={dp} but only {n} devices visible")
    for name, ds_cfg in getattr(cfg.data, "datasets", {}).items():
        bs = getattr(ds_cfg, "batch_size", None)
        if bs and bs % dp:
            raise ValueError(
                f"dataset {name!r} batch_size={bs} not divisible by "
                f"data_parallel={dp}"
            )
    from mmtpu.parallel.mesh import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(data_parallel=dp, model_parallel=1),
                       devices=jax.devices()[:dp])
    get_logger().info(f"data-parallel mesh: {dp} devices")
    return mesh


def promote_numpy_warnings() -> None:
    """Promote the numpy RuntimeWarnings the reference hardens into errors
    (train_multimodal.py:46-60): degenerate metric slices, divide-by-zero,
    and NaN propagation in multiplies fail loudly instead of silently
    poisoning epoch metrics."""
    import warnings

    for message in (
        "Degrees of freedom <= 0 for slice",
        "divide by zero encountered in divide",
        "invalid value encountered in multiply",
    ):
        warnings.filterwarnings(
            "error", message=message, category=RuntimeWarning
        )


def finalize_config(cfg, args):
    """Post-load wiring shared by EVERY driver: the numpy-warning
    tripwire, precision knob, --seed/--dry-run/--disable_monitoring
    overrides, output dirs, and the run log file. train_cmam loads through
    CMAMConfig and must call this too — skipping it silently ignores
    --seed and experiment.precision."""
    promote_numpy_warnings()
    apply_precision(cfg)
    if getattr(args, "seed", None) is not None:
        cfg.experiment.seed = args.seed
        np.random.seed(args.seed)
    # --stacked-runs member i trains with seed base+i (run_n.sh semantics);
    # the offset rides on args so EVERY config loader (standard and CMAM)
    # applies it in one place.
    offset = int(getattr(args, "seed_offset", 0) or 0)
    if offset:
        cfg.experiment.seed = int(cfg.experiment.seed) + offset
    if getattr(args, "dry_run", False):
        cfg.experiment.dry_run = True
    if getattr(args, "epochs", None) is not None:
        cfg.training.epochs = int(args.epochs)
    if getattr(args, "disable_monitoring", False) and hasattr(cfg, "monitoring"):
        cfg.monitoring.enabled = False
    cfg.logging.create_directories()
    configure_logger(cfg.logging.log_path, suffix=f"run_{args.run_id}")
    return cfg


def load_config(args) -> StandardMultimodalConfig:
    cfg = StandardMultimodalConfig.load(args.config, run_id=args.run_id)
    return finalize_config(cfg, args)


def derive_member_args(args, base_run: int, i: int):
    """Member i of a --stacked-runs sweep: run_id base+i, seed seed+i
    (applied by finalize_config via seed_offset), stacking disarmed.

    The ONE definition of the member recipe — the stacked engine
    (stacked_cv.run_repeat) and every sequential fallback derive members
    through it, so the \"stacked matches K sequential invocations\"
    contract can't drift between the two."""
    sub = argparse.Namespace(**vars(args))
    sub.run_id = base_run + i
    sub.stacked_runs = 0
    sub.seed_offset = i
    return sub


def run_id_sweep(args, run_one) -> int:
    """Honor --stacked-runs K in drivers WITHOUT a stacking engine
    (train_monomodal, train_cmam): the reference's run_n.sh loop
    (run_n.sh:23-27) — invoke run_one once per derived member, aborting
    the sweep on the first failure like the reference script."""
    runs = int(getattr(args, "stacked_runs", 0) or 0)
    if runs <= 1:
        return run_one(args)
    console.warning(
        "this driver has no stacking engine; running the "
        f"{runs} members sequentially (run_n.sh semantics)"
    )
    base_run = int(args.run_id)
    for i in range(runs):
        sub = derive_member_args(args, base_run, i)
        console.rule(f"run {sub.run_id} ({i + 1}/{runs})")
        rc = run_one(sub)
        if rc != 0:
            return rc
    return 0


# ---------------------------------------------------------------------------
# model assembly
# ---------------------------------------------------------------------------

ENCODER_KEYS = ("audio_encoder", "image_encoder", "text_encoder", "video_encoder")


def build_model_from_config(model_cfg) -> Any:
    """ModelConfig → Flax module (specs built lazily inside the registry)."""
    if getattr(model_cfg, "init_fn", None):
        # Faithful no-op, surfaced loudly: the reference passes the WHOLE
        # composite model to kaiming_init (train_multimodal.py:150-153),
        # whose isinstance(module, (Conv2d, Linear, BatchNorm2d)) check
        # never matches a top-level model (experiment_utils/utils.py:283-291
        # — the author presumably meant model.apply(kaiming_init)). The ch3
        # MMIN/RedCore configs set init_fn: "kaiming", so their reference
        # runs trained on DEFAULT torch init; mmtpu preserves that by not
        # re-initializing either. models/tools.py:init_weights provides the
        # intended behavior for users who want it.
        console.warning(
            f"init_fn={model_cfg.init_fn!r} noted but NOT applied — it is a "
            "silent no-op in the reference (kaiming_init receives the whole "
            "model, never a Conv2d/Linear); see mmtpu/cli/common.py"
        )
    return build_module(model_cfg.model_type, **model_cfg.kwargs)


def init_model(model, sample_inputs: List[np.ndarray], seed: int):
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": rng, "dropout": rng},
        *[jax.numpy.asarray(x) for x in sample_inputs],
        train=False,
    )
    return variables["params"], variables.get("batch_stats", {})


def load_pretrained_encoders(
    params, batch_stats, pretrained: Dict[str, str], logging_cfg, run_id: int
) -> Tuple[Any, Any, List[str]]:
    """Fill `{modality}_encoder` subtrees from checkpoint files
    (reference train_multimodal.py:156-204)."""
    from mmtpu.utils.utils import format_path_with_env

    params = dict(params)
    batch_stats = dict(batch_stats) if batch_stats else {}
    loaded = []
    # reference resolution order per modality: net{A,I,T,V} first, then
    # {modality}_model, then {modality}_encoder (train_multimodal.py:165-180)
    net_letter = {"audio": "netA", "image": "netI", "text": "netT",
                  "video": "netV"}
    for modality, path in (pretrained or {}).items():
        candidates = [
            net_letter.get(str(modality).lower()),
            f"{modality}_model",
            f"{modality}_encoder",
        ]
        attr = next((c for c in candidates if c and c in params), None)
        if attr is None:
            get_logger().warning(
                f"model has no encoder submodule for {modality!r} "
                f"(tried {candidates}); skipping"
            )
            continue
        resolved = logging_cfg.format_path(format_path_with_env(str(path)))
        enc_params, enc_stats = load_encoder_checkpoint(
            resolved, params[attr], batch_stats.get(attr)
        )
        params[attr] = enc_params
        if enc_stats is not None and attr in batch_stats:
            batch_stats[attr] = enc_stats
        loaded.append(modality)
        console.success(f"loaded pretrained {modality} encoder from {resolved}")
    return params, batch_stats, loaded


def encoder_param_groups(
    training: TrainingConfig, params
) -> List[Tuple[str, Dict[str, Any]]]:
    """encoder_optimizer + modality_specific_params → (regex, kwargs) groups
    (reference train_multimodal.py:216-305)."""
    groups: List[Tuple[str, Dict[str, Any]]] = []
    enc_kwargs = (
        dict(training.encoder_optimizer.default_kwargs)
        if training.encoder_optimizer
        else None
    )
    specific = training.modality_specific_params or {}
    for attr in params:
        if not str(attr).endswith("_encoder"):
            continue
        kwargs = dict(enc_kwargs) if enc_kwargs else None
        if attr in specific:
            kwargs = {**(kwargs or {}), **specific[attr]}
        if kwargs:
            groups.append((f"^{attr}/", kwargs))
    return groups


def make_state(model, params, batch_stats, training: TrainingConfig,
               clip: Optional[float] = None):
    extra = encoder_param_groups(training, params)
    tx, report = build_optimizer(
        training.optimizer, params, extra_groups=extra, clip=clip
    )
    for name, kw in report.items():
        get_logger().info(f"optimizer group {name}: {kw}")
    return TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats, tx=tx
    )


def make_lr_controller(training: TrainingConfig) -> Optional[LRController]:
    if not training.scheduler:
        return None
    base_lr = float(training.optimizer.default_kwargs.get("lr", 1e-3))
    return LRController(training.scheduler, training.scheduler_args, base_lr)


def make_early_stopping(cfg) -> EarlyStopping:
    return EarlyStopping(
        patience=cfg.training.early_stopping_patience,
        min_delta=cfg.training.early_stopping_min_delta,
        mode=mode_for_metric(cfg.logging.save_metric),
        enabled=cfg.training.early_stopping,
    )


def make_recorder(cfg) -> MetricRecorder:
    return MetricRecorder(
        cfg.metrics,
        tensorboard_path=cfg.logging.tensorboard_path,
        tb_record_only=cfg.logging.tb_record_only,
    )


def make_monitor(cfg, resume: bool = False):
    """ExperimentMonitor when enabled (reference setup_tracking :378-435).
    resume=True appends to the previous run's monitor_data.h5 instead of
    truncating it."""
    if not cfg.monitoring.enabled or not cfg.logging.monitor_path:
        return None
    from mmtpu.monitor import ExperimentMonitor

    return ExperimentMonitor(cfg.monitoring, cfg.logging.monitor_path,
                             resume=resume)


def make_checkpoint_manager(cfg) -> CheckpointManager:
    # async_io: serialization + disk writes run on a writer thread off the
    # training path (snapshots are taken synchronously); every load path
    # drains the queue first, and the executor joins at process exit
    return CheckpointManager(
        cfg.logging.model_output_path,
        save_metric=cfg.logging.save_metric,
        mode=mode_for_metric(cfg.logging.save_metric),
        async_io=True,
    )


def infer_monomodal_modality(cfg) -> Modality:
    """Which modality a monomodal run trains on: encoder attr in the model
    kwargs, else the experiment-name heuristic (train_monomodal.py:103-128,
    441-482)."""
    for key in ENCODER_KEYS:
        if key in cfg.model.kwargs:
            return Modality(key.split("_")[0])
    name = cfg.experiment.name.lower()
    for mod in ("audio", "image", "text", "video"):
        if mod in name:
            return Modality(mod)
    raise ValueError("cannot infer monomodal modality from config")


def infer_num_classes(cfg) -> int:
    """num_classes heuristic (train_monomodal.py:506-522)."""
    n = cfg.model.kwargs.get("num_classes")
    if n:
        return int(n)
    name = (cfg.experiment.name + " " + cfg.model.name).lower()
    if "mmimdb" in name or "imdb" in name:
        return 23
    if "mosi" in name or "mosei" in name:
        return 3
    return 10  # avmnist default


def sample_inputs_for(dataset, input_mods: List[Modality]) -> List[np.ndarray]:
    return [dataset.arrays[m][:2] for m in input_mods]
