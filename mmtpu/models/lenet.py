"""LeNet-5 encoders (reference: models/msa/networks/lenet.py:8-195).

Topology: conv5×5/p2 → BN → ReLU → pool2 → conv5×5/p0 → BN → ReLU → pool2 →
fc(…→120) → fc(120→hidden). The reference's dynamic audio-reshape heuristics
(:92-137) are data-dependent Python control flow — illegal under jit — so the
equivalent reshaping happens once in the host-side pipeline; the module takes
fixed-shape NHWC input.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm

from mmtpu.models.conv import max_pool

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class LeNetEncoder(nn.Module):
    in_channels: int = 1
    hidden_dim: int = 84
    feature_maps: Sequence[int] = (6, 16)

    def get_embedding_size(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        x = nn.Conv(
            self.feature_maps[0], (5, 5), padding=((2, 2), (2, 2)),
            kernel_init=_KAIMING, name="conv1",
        )(x)
        x = batch_norm(x, train=train, name="bn1")
        x = nn.relu(x)
        x = max_pool(x, 2)
        x = nn.Conv(
            self.feature_maps[1], (5, 5), padding="VALID",
            kernel_init=_KAIMING, name="conv2",
        )(x)
        x = batch_norm(x, train=train, name="bn2")
        x = nn.relu(x)
        x = max_pool(x, 2)

        x = x.reshape(x.shape[0], -1)
        expected = self.feature_maps[1] * 5 * 5
        # Static-shape equivalent of the reference's pad/pool size fixup.
        if x.shape[1] > expected:
            x = x[:, :expected]
        elif x.shape[1] < expected:
            x = jnp.pad(x, ((0, 0), (0, expected - x.shape[1])))

        x = nn.relu(
            nn.Dense(120, kernel_init=nn.initializers.normal(0.01), name="fc1")(x)
        )
        x = nn.Dense(
            self.hidden_dim, kernel_init=nn.initializers.normal(0.01), name="fc2"
        )(x)
        return x


def LeNet5(in_channels: int = 1, hidden_dim: int = 84, **kwargs) -> LeNetEncoder:
    return LeNetEncoder(
        in_channels=in_channels, hidden_dim=hidden_dim, feature_maps=(6, 16)
    )


def LeNet5Enhanced(in_channels: int = 1, hidden_dim: int = 128, **kwargs) -> LeNetEncoder:
    return LeNetEncoder(
        in_channels=in_channels, hidden_dim=hidden_dim, feature_maps=(16, 32)
    )
