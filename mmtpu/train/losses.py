"""Loss criteria + LossFunctionGroup — the universal loss interface.

Reference: experiment_utils/loss.py — `resolve_criterion` (20 torch losses,
:37-80), `WeightedLossTerm` (:84) and `LossFunctionGroup` (:116-148), whose
call contract every train step relies on:
``loss_functions(logits, labels)["total_loss"]``.

All criteria here are pure jnp functions (jit-safe, grad-safe). Reduction is
mean over the batch, matching the torch defaults.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Set, Union

import jax
import jax.numpy as jnp
import optax


def _as_float(x):
    return x.astype(jnp.float32) if hasattr(x, "astype") else jnp.asarray(x, jnp.float32)


def _masked_reduce(per_sample, sample_mask=None, weights=None):
    """Weighted/masked batch mean matching torch semantics:
    sum(w·m·l) / sum(w·m). Per-sample losses with extra dims are averaged
    over their non-batch axes first. sample_mask zeroes padded tail rows so
    fixed-shape batches (SURVEY §5.7) don't bias the loss."""
    if per_sample.ndim > 1:
        per_sample = per_sample.reshape(per_sample.shape[0], -1).mean(axis=1)
    eff = weights
    if sample_mask is not None:
        eff = sample_mask if eff is None else eff * sample_mask
    if eff is None:
        return jnp.mean(per_sample)
    return jnp.sum(per_sample * eff) / jnp.maximum(jnp.sum(eff), 1e-8)


def cross_entropy(
    logits, targets, weight=None, label_smoothing: float = 0.0, sample_mask=None
):
    """Softmax CE over integer class targets (torch CrossEntropyLoss)."""
    targets = targets.astype(jnp.int32)
    logits = _as_float(logits)
    if label_smoothing:
        n = logits.shape[-1]
        smoothed = optax.smooth_labels(
            jax.nn.one_hot(targets, n), label_smoothing
        )
        losses = optax.softmax_cross_entropy(logits, smoothed)
    else:
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    w = jnp.asarray(weight)[targets] if weight is not None else None
    return _masked_reduce(losses, sample_mask, w)


def nll(log_probs, targets, sample_mask=None):
    targets = targets.astype(jnp.int32)
    per = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    return _masked_reduce(per, sample_mask)


def mse(preds, targets, sample_mask=None):
    return _masked_reduce(
        jnp.square(_as_float(preds) - _as_float(targets)), sample_mask
    )


def l1(preds, targets, sample_mask=None):
    return _masked_reduce(
        jnp.abs(_as_float(preds) - _as_float(targets)), sample_mask
    )


def smooth_l1(preds, targets, beta: float = 1.0, sample_mask=None):
    d = jnp.abs(_as_float(preds) - _as_float(targets))
    return _masked_reduce(
        jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta), sample_mask
    )


def huber(preds, targets, delta: float = 1.0, sample_mask=None):
    d = jnp.abs(_as_float(preds) - _as_float(targets))
    return _masked_reduce(
        jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta)), sample_mask
    )


def bce(probs, targets, sample_mask=None):
    p = jnp.clip(_as_float(probs), 1e-7, 1.0 - 1e-7)
    t = _as_float(targets)
    return _masked_reduce(
        -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)), sample_mask
    )


def bce_with_logits(logits, targets, pos_weight=None, sample_mask=None):
    logits = _as_float(logits)
    t = _as_float(targets)
    if pos_weight is not None:
        # torch semantics: pos_weight scales ONLY the positive log term,
        # -[pw·t·log σ + (1-t)·log(1-σ)] — not the whole per-element loss
        # (the two differ for soft targets t ∉ {0, 1})
        losses = -(
            jnp.asarray(pos_weight) * t * jax.nn.log_sigmoid(logits)
            + (1.0 - t) * jax.nn.log_sigmoid(-logits)
        )
    else:
        losses = optax.sigmoid_binary_cross_entropy(logits, t)
    return _masked_reduce(losses, sample_mask)


def kl_div(log_preds, targets, sample_mask=None):
    # torch KLDivLoss() default reduction='mean' averages over ALL elements
    # (sum/numel), not per-sample sums — keep the elementwise losses and let
    # _masked_reduce mean over the class axis then the batch.
    t = _as_float(targets)
    per = t * (jnp.where(t > 0, jnp.log(t), 0.0) - log_preds)
    return _masked_reduce(per, sample_mask)


def cosine_embedding(x1, x2, target, margin: float = 0.0, sample_mask=None):
    sim = jnp.sum(x1 * x2, axis=-1) / (
        jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1) + 1e-8
    )
    pos = 1.0 - sim
    neg = jnp.maximum(0.0, sim - margin)
    return _masked_reduce(jnp.where(target > 0, pos, neg), sample_mask)


def identity_loss(x, *_args, **_kwargs):
    return x


_CRITERIA: Dict[str, Callable[..., Callable]] = {}


def _register(name: str, fn: Callable, **bound_defaults: Any) -> None:
    def factory(**kwargs):
        merged = {**bound_defaults, **kwargs}

        def criterion(preds, targets, **call_kwargs):
            return fn(preds, targets, **merged, **call_kwargs)

        criterion.__name__ = name
        return criterion

    _CRITERIA[name] = factory


_register("cross_entropy", cross_entropy)
_register("nll", nll)
_register("mse", mse)
_register("bce", bce)
_register("bce_with_logits", bce_with_logits)
_register("l1", l1)
_register("smooth_l1", smooth_l1)
_register("kl_div", kl_div)
_register("huber", huber)
# registered-but-uncallable through the (preds, targets) term contract,
# exactly like the reference: torch's CosineEmbeddingLoss needs a third
# `target` argument its WeightedLossTerm never supplies (loss.py:58), so a
# config naming 'cosine' fails at the first step in both frameworks
_register("cosine", cosine_embedding)
_register("cycle", mse)
_register("na", identity_loss)


def register_criterion(name: str, factory: Callable[..., Callable]) -> None:
    """Extension hook (e.g. CMAMLoss registers itself here)."""
    _CRITERIA[name.lower()] = factory


def resolve_criterion(name: str) -> Callable[..., Callable]:
    key = name.lower()
    if key == "cmam":
        # Lazy: composite reconstruction loss lives in mmtpu/train/cmam_loss.py.
        from mmtpu.train.cmam_loss import CMAMLoss

        return CMAMLoss
    if key not in _CRITERIA:
        raise ValueError(
            f"Unknown criterion: {name}. Available: {sorted(_CRITERIA)} + ['cmam']"
        )
    return _CRITERIA[key]


class WeightedLossTerm:
    """loss_fn + scalar weight → dict with at least 'total_loss'."""

    def __init__(self, loss_fn: Callable, weight: float = 1.0, name: str = "") -> None:
        self.loss_fn = loss_fn
        self.weight = float(weight)
        self.name = name

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "WeightedLossTerm":
        loss_name = data["loss_name"]
        loss_kwargs = data.get("loss_kwargs", data.get("loss_args", {})) or {}
        weight = data.get("weight", 1.0)
        factory = resolve_criterion(loss_name)
        return cls(loss_fn=factory(**loss_kwargs), weight=weight, name=loss_name)

    def __call__(
        self,
        inputs,
        targets,
        override_weight_with: Optional[float] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        w = self.weight if override_weight_with is None else override_weight_with
        value = self.loss_fn(inputs, targets, **self._accepted(kwargs))
        if isinstance(value, dict):
            return {k: v * w for k, v in value.items()}
        return {"total_loss": value * w}

    def _accepted(self, kwargs: Dict[str, Any]) -> Dict[str, Any]:
        """Drop call kwargs the criterion's signature can't take (e.g.
        sample_mask for user criteria registered via register_criterion
        without the parameter)."""
        kwargs = {k: v for k, v in kwargs.items() if v is not None}
        if not kwargs:
            return kwargs
        if not hasattr(self, "_sig_params"):
            import inspect

            try:
                sig = inspect.signature(self.loss_fn)
                has_var = any(
                    p.kind == inspect.Parameter.VAR_KEYWORD
                    for p in sig.parameters.values()
                )
                self._sig_params = None if has_var else set(sig.parameters)
            except (TypeError, ValueError):
                self._sig_params = None  # builtins etc. — pass everything
        if self._sig_params is None:
            return kwargs
        return {k: v for k, v in kwargs.items() if k in self._sig_params}

    def __repr__(self) -> str:  # noqa: D105
        return f"WeightedLossTerm({self.name or self.loss_fn}, weight={self.weight})"


class LossFunctionGroup(Dict[str, WeightedLossTerm]):
    """Dict of named weighted terms; calling sums selected terms' dicts."""

    @classmethod
    def from_dict(cls, data: Dict[str, Dict[str, Any]]) -> "LossFunctionGroup":
        return cls(
            {key: WeightedLossTerm.from_dict(value) for key, value in data.items()}
        )

    def __call__(
        self,
        inputs,
        targets,
        key: Optional[Union[str, Set[str]]] = None,
        override_weight_with: Optional[float] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        keys = {key} if isinstance(key, str) else key
        losses: Dict[str, Any] = {}
        for term_name, term in self.items():
            if keys is not None and term_name not in keys:
                continue
            for k, v in term(inputs, targets, override_weight_with, **kwargs).items():
                losses[k] = losses.get(k, 0.0) + v
        if not losses:
            losses["total_loss"] = jnp.asarray(0.0)
        return losses
