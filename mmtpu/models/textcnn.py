"""TextCNN (reference: models/msa/networks/textcnn.py:10-69).

Three parallel convolutions with kernel heights [3,4,5] spanning the full
feature width, ReLU, global max-pool over the sequence, concat, dropout,
Dense+ReLU to embd_size. Implemented as NHWC convs (seq = H, feat = W)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class TextCNN(nn.Module):
    input_size: int
    embd_size: int = 128
    in_channels: int = 1
    out_channels: int = 128
    kernel_heights: Sequence[int] = (3, 4, 5)
    dropout: float = 0.5

    def get_embedding_size(self) -> int:
        return self.embd_size

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, seq, feat) → (B, seq, feat, 1)
        h = x[..., None]
        pooled = []
        for i, k in enumerate(self.kernel_heights):
            c = nn.Conv(
                self.out_channels,
                kernel_size=(k, self.input_size),
                padding="VALID",
                name=f"conv{i + 1}",
            )(h)  # (B, seq-k+1, 1, out)
            c = nn.relu(c[:, :, 0, :])
            pooled.append(jnp.max(c, axis=1))  # (B, out)
        out = jnp.concatenate(pooled, axis=1)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.relu(nn.Dense(self.embd_size, name="embd")(out))
        return out
