"""Conv building block (reference: models/conv.py:7-60).

(Conv → BatchNorm → ReLU) × 2 — the hot op of the AVMNIST encoders. Layout
is NHWC (TPU-native); XLA fuses the BN+ReLU elementwise chain into the conv
epilogue on TPU, which is the profitable fusion here (the conv itself rides
the MXU).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


@dataclasses.dataclass
class ConvBlockArgs:
    """Constructor args for one conv layer (YAML `!ConvBlockArgs`)."""

    conv_one_in: int
    conv_one_out: int
    conv_one_kernel_size: Union[int, Tuple[int, int]] = (3, 3)
    conv_one_stride: Union[int, Tuple[int, int]] = (1, 1)
    conv_one_padding: Union[int, Tuple[int, int]] = (1, 1)


def _as_args(v) -> ConvBlockArgs:
    """Accept ConvBlockArgs, ModuleSpec('conv_block_args', ...), or dict."""
    if isinstance(v, ConvBlockArgs):
        return v
    if hasattr(v, "kwargs"):  # ModuleSpec
        return ConvBlockArgs(**v.kwargs)
    return ConvBlockArgs(**v)


class ConvBlock(nn.Module):
    """Two conv+BN+ReLU layers. Expects NHWC input."""

    conv_block_one_args: ConvBlockArgs
    conv_block_two_args: ConvBlockArgs
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, args in enumerate(
            (_as_args(self.conv_block_one_args), _as_args(self.conv_block_two_args))
        ):
            pad = _pair(args.conv_one_padding)
            x = nn.Conv(
                features=args.conv_one_out,
                kernel_size=_pair(args.conv_one_kernel_size),
                strides=_pair(args.conv_one_stride),
                padding=((pad[0], pad[0]), (pad[1], pad[1])),
                name=f"conv_{i + 1}",
            )(x)
            if self.batch_norm:
                x = batch_norm(x, train=train, name=f"bn_{i + 1}")
            x = nn.relu(x)
        return x


def _torch_pool(x: jnp.ndarray, window, pool_fn) -> jnp.ndarray:
    """Torch-semantics 2-D pooling over NHWC: stride = window, floor
    division (trailing rows/cols that don't fill a window are dropped).
    One implementation for max/avg so the crop logic can't diverge."""
    w = _pair(window)
    h_keep = (x.shape[1] // w[0]) * w[0]
    w_keep = (x.shape[2] // w[1]) * w[1]
    x = x[:, :h_keep, :w_keep, :]
    return pool_fn(x, window_shape=w, strides=w)


def max_pool(x: jnp.ndarray, window: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    """Torch-semantics MaxPool2d (floor mode)."""
    return _torch_pool(x, window, nn.max_pool)


def avg_pool(x: jnp.ndarray, window: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    """Torch-semantics AvgPool2d (floor mode)."""
    return _torch_pool(x, window, nn.avg_pool)
