"""Pad-aware BatchNorm: batch statistics over real rows only.

Fixed-shape batches (SURVEY §5.7) zero-pad tail rows when the split size
is not a batch multiple. The loss already masks those rows
(losses._masked_reduce), but BatchNorm would still fold the zeros into its
batch mean/variance AND into the running averages — the torch reference
never sees them (it feeds a smaller real tail batch,
torch DataLoader drop_last=False semantics). `batch_norm` below computes
statistics over real rows only, restoring parity without giving up static
shapes: the train step publishes the batch's sample mask for the duration
of the forward trace (`batch_mask`), and every model's BN site reads it.

The mask context is TRACE-time state: it holds a jax tracer only while the
step function is being traced; the resulting jaxpr carries the mask as an
ordinary data dependency, so compiled-executable cache hits are unaffected
and nothing leaks across traces (the context manager unwinds before the
trace returns). Model signatures and parameter/`batch_stats` layouts are
unchanged — checkpoints are unaffected.

Flax's `nn.BatchNorm(..., mask=...)` does the masked-statistics math; this
module only routes the mask to it.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Optional

import flax.linen as nn
import jax.numpy as jnp

_current: list = []


@contextmanager
def batch_mask(mask: Optional[jnp.ndarray]) -> Iterator[None]:
    """Publish the current batch's (B,) sample mask (1 = real row) for any
    BatchNorm traced inside the `with` body. None is allowed (no-op)."""
    _current.append(mask)
    try:
        yield
    finally:
        _current.pop()


def current_mask() -> Optional[jnp.ndarray]:
    return _current[-1] if _current else None


def batch_norm(
    x: jnp.ndarray,
    *,
    train: bool,
    name: str,
    momentum: float = 0.9,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Drop-in for the framework's nn.BatchNorm sites (same param names).

    In train mode, rows masked out by the published batch mask are excluded
    from the batch statistics and the running-average update. Inputs whose
    leading dim is not the batch (no published mask, or a mask of a
    different length — e.g. sequence-major tensors) normalize unmasked.
    """
    mask = current_mask()
    bn_mask = None
    if mask is not None and mask.ndim == 1 and mask.shape[0] == x.shape[0]:
        bn_mask = (mask > 0).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=epsilon,
        name=name,
    )(x, mask=bn_mask)
