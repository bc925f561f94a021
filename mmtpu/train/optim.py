"""Optimizer factory + host-side LR scheduling.

Reference counterparts: config/optimizer_config.py `ParameterGroupsOptimizer`
(:137-210) and `get_scheduler` (multimodal_training_config.py:164-224; 9
torch schedulers, resolvers.py:159-189).

TPU-native design: one optax transform per parameter group (regex over
'/'-joined param paths), combined with `optax.masked` so the whole update is
a single fused pass; a global `lr_scale` hyperparameter is injected so
host-side schedulers (plateau etc., stepped once per epoch like the
reference) rescale the LR without recompiling the train step.

Torch-semantics notes: "Adam with weight_decay" is L2-in-gradient (coupled),
so groups chain add_decayed_weights *before* scale_by_adam; "AdamW" is
decoupled (after).
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import optax

from mmtpu.config.optim import OptimizerConfig
from mmtpu.utils.logging import get_logger

logger = get_logger()


# ---------------------------------------------------------------------------
# param path utilities
# ---------------------------------------------------------------------------

def param_paths(params: Any) -> List[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(_key_str(k) for k in path) for path, _ in flat]


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


# ---------------------------------------------------------------------------
# single-group transform
# ---------------------------------------------------------------------------

def _group_tx(name: str, kwargs: Dict[str, Any]) -> optax.GradientTransformation:
    """Build the torch-equivalent optax chain for one param group."""
    kw = dict(kwargs)
    # YAML 1.1 parses dot-less scientific notation ('5e-5') as a string;
    # the reference coerces with float() (config/optimizer_config.py:181,203).
    lr = float(kw.pop("lr", 1e-3))
    wd = float(kw.pop("weight_decay", 0.0))
    name = name.lower()

    if name == "adam":
        betas = [float(b) for b in kw.pop("betas", (0.9, 0.999))]
        eps = float(kw.pop("eps", 1e-8))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # coupled L2
        parts += [optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
                  optax.scale(-lr)]
        return optax.chain(*parts)
    if name == "adamw":
        betas = [float(b) for b in kw.pop("betas", (0.9, 0.999))]
        eps = float(kw.pop("eps", 1e-8))
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)
    if name == "sgd":
        momentum = float(kw.pop("momentum", 0.0))
        nesterov = kw.pop("nesterov", False)
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
        parts.append(optax.scale(-lr))
        return optax.chain(*parts)
    if name == "rmsprop":
        alpha = float(kw.pop("alpha", 0.99))
        eps = float(kw.pop("eps", 1e-8))
        momentum = float(kw.pop("momentum", 0.0))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_rms(decay=alpha, eps=eps))
        if momentum:
            parts.append(optax.trace(decay=momentum))
        parts.append(optax.scale(-lr))
        return optax.chain(*parts)
    if name == "adagrad":
        parts = [optax.add_decayed_weights(wd)] if wd else []
        return optax.chain(*parts, optax.scale_by_rss(), optax.scale(-lr))
    if name == "adadelta":
        rho = float(kw.pop("rho", 0.9))
        eps = float(kw.pop("eps", 1e-6))
        return optax.adadelta(lr, rho=rho, eps=eps, weight_decay=wd)
    if name == "adamax":
        betas = [float(b) for b in kw.pop("betas", (0.9, 0.999))]
        parts = [optax.add_decayed_weights(wd)] if wd else []
        return optax.chain(
            *parts, optax.scale_by_adamax(b1=betas[0], b2=betas[1]), optax.scale(-lr)
        )
    if name in ("asgd",):  # averaged SGD ≈ SGD for our purposes
        parts = [optax.add_decayed_weights(wd)] if wd else []
        return optax.chain(*parts, optax.scale(-lr))
    if name in ("lbfgs",):
        return optax.lbfgs(lr)
    if name in ("sparse_adam",):
        return optax.adam(lr)
    raise ValueError(f"Unknown optimizer: {name}")


# ---------------------------------------------------------------------------
# parameter-group optimizer
# ---------------------------------------------------------------------------

def build_optimizer(
    config: OptimizerConfig,
    params: Any,
    extra_groups: Optional[Sequence[Tuple[str, Dict[str, Any]]]] = None,
    clip: Optional[float] = None,
) -> Tuple[optax.GradientTransformation, Dict[str, Dict[str, Any]]]:
    """Assemble the full transform.

    extra_groups: (path_regex, kwargs-overrides) from encoder_optimizer /
    modality_specific_params (reference train_multimodal.py:216-305).
    clip: global-norm gradient clipping (the reference's
    torch.nn.utils.clip_grad_norm_, applied by UttFusion/MMIN/RedCore/CMAM
    train steps, e.g. utt_fusion.py:189).
    Returns (tx, group_report) where group_report maps group name → effective
    kwargs (for logging / effective-LR reporting).
    """
    groups: List[Tuple[str, Dict[str, Any]]] = []
    for g in config.parameter_groups:
        groups.append((g.pattern, g.effective_kwargs(config.default_kwargs)))
    for pattern, overrides in extra_groups or ():
        groups.append((pattern, {**config.default_kwargs, **overrides}))

    paths = param_paths(params)
    report: Dict[str, Dict[str, Any]] = {}

    if not groups:
        tx = _scaled(_group_tx(config.name, dict(config.default_kwargs)), clip)
        report["default"] = dict(config.default_kwargs)
        return tx, report

    # overlap detection (reference optimizer_config.py:107-135)
    claimed: Dict[str, str] = {}
    for pattern, _ in groups:
        rx = re.compile(pattern)
        for p in paths:
            if rx.search(p):
                if p in claimed and claimed[p] != pattern:
                    raise ValueError(
                        f"Parameter {p!r} matched by groups {claimed[p]!r} and {pattern!r}"
                    )
                claimed[p] = pattern

    transforms: Dict[str, optax.GradientTransformation] = {}
    labels = _label_tree(params, [pat for pat, _ in groups])
    for i, (pattern, kwargs) in enumerate(groups):
        transforms[f"group_{i}"] = _group_tx(config.name, dict(kwargs))
        report[f"group_{i}:{pattern}"] = kwargs
    transforms["default"] = _group_tx(config.name, dict(config.default_kwargs))
    report["default"] = dict(config.default_kwargs)

    return _scaled(optax.multi_transform(transforms, labels), clip), report


def _label_tree(params: Any, patterns: List[str]) -> Any:
    regexes = [re.compile(p) for p in patterns]

    def label_for(path: str) -> str:
        for i, rx in enumerate(regexes):
            if rx.search(path):
                return f"group_{i}"
        return "default"

    flat = jax.tree_util.tree_flatten_with_path(params)
    labels_flat = [
        label_for("/".join(_key_str(k) for k in path)) for path, _ in flat[0]
    ]
    return jax.tree_util.tree_unflatten(flat[1], labels_flat)


def _scaled(
    inner: optax.GradientTransformation, clip: Optional[float] = None
) -> optax.GradientTransformation:
    """Wrap with optional global-norm clipping and an injected global
    lr_scale multiplier (host-settable)."""

    def build(lr_scale):
        parts = []
        if clip:
            parts.append(optax.clip_by_global_norm(clip))
        parts += [inner, optax.scale(lr_scale)]
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(lr_scale=1.0)


def set_lr_scale(opt_state, scale: float):
    """Return opt_state with a new lr_scale hyperparameter (no recompile)."""
    import jax.numpy as jnp

    opt_state.hyperparams["lr_scale"] = jnp.asarray(
        scale, dtype=opt_state.hyperparams["lr_scale"].dtype
    )
    return opt_state


# ---------------------------------------------------------------------------
# host-side LR controllers (per-epoch, like the reference's scheduler.step())
# ---------------------------------------------------------------------------

class LRController:
    """Computes a multiplicative lr scale per epoch. step() returns scale."""

    def __init__(self, kind: Optional[str], args: Dict[str, Any], base_lr: float):
        self.kind = (kind or "").lower() or None
        self.args = dict(args or {})
        self.base_lr = base_lr
        self.epoch = 0
        # plateau state
        self._best: Optional[float] = None
        self._num_bad = 0
        self._cooldown = 0
        self._scale = 1.0

    def step(self, metric: Optional[float] = None) -> float:
        # _scale always holds the last-applied scale so the resume point
        # (loop._save_resume_point) records what the optimizer is actually
        # running at — not just for plateau, which updates it internally.
        scale = self._compute(metric)
        self._scale = float(scale)
        return scale

    def _compute(self, metric: Optional[float] = None) -> float:
        if self.kind is None:
            return 1.0
        k = self.kind
        if k == "plateau":
            return self._plateau_step(metric)
        # torch schedulers are stepped AFTER an epoch and their factor
        # applies to the NEXT one (last_epoch advances first)
        self.epoch += 1
        e = self.epoch
        if k == "step":
            size = int(self.args.get("step_size", 30))
            gamma = float(self.args.get("gamma", 0.1))
            return gamma ** (e // size)
        if k == "multistep":
            milestones = sorted(self.args.get("milestones", []))
            gamma = float(self.args.get("gamma", 0.1))
            import bisect

            return gamma ** bisect.bisect_right(milestones, e)
        if k == "exponential":
            gamma = float(self.args.get("gamma", 0.9))
            return gamma**e
        if k == "cosine":
            t_max = int(self.args.get("T_max", 50))
            eta_min = float(self.args.get("eta_min", 0.0))
            lr = eta_min + (self.base_lr - eta_min) * (
                1 + math.cos(math.pi * e / t_max)
            ) / 2
            return lr / self.base_lr
        if k == "cosine_warmup":
            t0 = int(self.args.get("T_0", 10))
            t_mult = int(self.args.get("T_mult", 1))
            eta_min = float(self.args.get("eta_min", 0.0))
            t_cur, t_i = e, t0
            while t_cur >= t_i:
                t_cur -= t_i
                t_i *= t_mult
            lr = eta_min + (self.base_lr - eta_min) * (
                1 + math.cos(math.pi * t_cur / t_i)
            ) / 2
            return lr / self.base_lr
        if k == "lambda":
            # Faithful quirk (reference :188-224): the multiplier is an
            # eval()'d YAML expression of `epoch`. Shipped configs use two
            # forms: a bare arithmetic expression, and a full
            # "lambda epoch: ..." string (ch3_experiments/*:
            # "lambda epoch: 1.0 - max(0, epoch + epoch_count - niter) /
            # float(niter_decay + 1)").
            expr = str(self.args.get("lr_lambda", "1.0"))
            scope = {
                key: v for key, v in self.args.items() if key != "lr_lambda"
            }
            scope["epoch"] = e
            scope["math"] = math
            # An allowlisted __builtins__ keeps the quirk scoped to the
            # arithmetic the shipped expressions actually use — without the
            # override Python injects the full builtins and a config file
            # gains arbitrary code execution.
            scope["__builtins__"] = {
                "max": max, "min": min, "abs": abs, "float": float,
                "int": int, "round": round, "pow": pow,
            }
            value = eval(expr, scope)  # noqa: S307
            if callable(value):
                value = value(e)
            return float(value)
        if k in ("cyclic", "onecycle"):
            max_lr = float(self.args.get("max_lr", self.base_lr))
            total = int(
                self.args.get("total_steps", self.args.get("step_size_up", 10) * 2)
            )
            pos = (e % total) / max(total - 1, 1)
            tri = 1.0 - abs(2.0 * pos - 1.0)
            lr = self.base_lr + (max_lr - self.base_lr) * tri
            return lr / self.base_lr
        raise ValueError(f"Unknown scheduler: {self.kind}")

    def _plateau_step(self, metric: Optional[float]) -> float:
        if metric is None:
            return self._scale
        mode = self.args.get("mode", "min")
        factor = float(self.args.get("factor", 0.1))
        patience = int(self.args.get("patience", 10))
        threshold = float(self.args.get("threshold", 1e-4))
        cooldown = int(self.args.get("cooldown", 0))
        min_lr = float(self.args.get("min_lr", 0.0))

        better = (
            self._best is None
            or (mode == "min" and metric < self._best * (1 - threshold))
            or (mode == "max" and metric > self._best * (1 + threshold))
        )
        if better:
            self._best = metric
            self._num_bad = 0
        elif self._cooldown > 0:
            self._cooldown -= 1
            self._num_bad = 0
        else:
            self._num_bad += 1
            if self._num_bad > patience:
                new_scale = max(self._scale * factor, min_lr / self.base_lr)
                if new_scale < self._scale:
                    logger.info(
                        f"plateau: lr {self.base_lr * self._scale:.2e} → "
                        f"{self.base_lr * new_scale:.2e}"
                    )
                self._scale = new_scale
                self._cooldown = cooldown
                self._num_bad = 0
        return self._scale
