"""ResNet encoders (reference: models/msa/networks/resnet.py:8-249).

Same topology — 7×7/s2 stem, [64,128,256,512] stages, adaptive-avgpool, fc
to hidden_dim — in Flax/NHWC. These are the north-star AVMNIST encoders
(ResNet18 audio hidden 64, ResNet34 image hidden 128). bfloat16-friendly:
all matmul/conv compute can run in bf16 with fp32 params (see train/step.py).
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, kernel_init=_KAIMING,
            name="conv1",
        )(x)
        out = batch_norm(out, train=train, name="bn1")
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=_KAIMING, name="conv2",
        )(out)
        out = batch_norm(out, train=train, name="bn2")

        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=_KAIMING, name="downsample_conv",
            )(x)
            identity = batch_norm(identity, train=train, name="downsample_bn")

        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(
            self.planes, (1, 1), use_bias=False, kernel_init=_KAIMING, name="conv1"
        )(x)
        out = batch_norm(out, train=train, name="bn1")
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, kernel_init=_KAIMING,
            name="conv2",
        )(out)
        out = batch_norm(out, train=train, name="bn2")
        out = nn.relu(out)
        out = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False,
            kernel_init=_KAIMING, name="conv3",
        )(out)
        out = batch_norm(out, train=train, name="bn3")

        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=_KAIMING, name="downsample_conv",
            )(x)
            identity = batch_norm(identity, train=train, name="downsample_bn")

        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Configurable ResNet; expects NHWC (a missing channel dim is added)."""

    block: Type[nn.Module] = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    in_channels: int = 1
    hidden_dim: int = 128

    def get_embedding_size(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:  # (B, H, W) → add channel dim (reference :201-203)
            x = x[..., None]
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
            kernel_init=_KAIMING, name="conv1",
        )(x)
        x = batch_norm(x, train=train, name="bn1")
        x = nn.relu(x)
        # MaxPool 3x3/s2/p1 (torch semantics)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = self.block(
                    planes=planes, stride=stride, name=f"layer{stage + 1}_{i}"
                )(x, train=train)

        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.Dense(self.hidden_dim, name="fc")(x)
        return x


def ResNet18(in_channels: int = 1, hidden_dim: int = 128, **kwargs) -> ResNetEncoder:
    return ResNetEncoder(
        block=BasicBlock, layers=(2, 2, 2, 2),
        in_channels=in_channels, hidden_dim=hidden_dim,
    )


def ResNet34(in_channels: int = 1, hidden_dim: int = 128, **kwargs) -> ResNetEncoder:
    return ResNetEncoder(
        block=BasicBlock, layers=(3, 4, 6, 3),
        in_channels=in_channels, hidden_dim=hidden_dim,
    )


def ResNet50(in_channels: int = 1, hidden_dim: int = 128, **kwargs) -> ResNetEncoder:
    return ResNetEncoder(
        block=Bottleneck, layers=(3, 4, 6, 3),
        in_channels=in_channels, hidden_dim=hidden_dim,
    )
