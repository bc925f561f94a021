"""MLP encoders/classifiers (reference: models/msa/networks/fc.py:5,
classifier.py:58-188).

FcEncoder: (Dense → ReLU [→ BN] [→ Dropout]) stack.
FcClassifier: FcEncoder stack + output Dense.
SimpleClassifier / MaxPoolFc: small heads used by MSA models.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm


class FcEncoder(nn.Module):
    input_dim: int
    layers: Sequence[int] = (128,)
    dropout: float = 0.5
    use_bn: bool = False

    def get_embedding_size(self) -> int:
        return self.layers[-1] if self.layers else self.input_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        # Static-shape fixup mirroring the reference's dim adaptation
        # (fc.py:31-53): truncate or zero-pad to the declared input_dim.
        if x.shape[1] > self.input_dim:
            x = x[:, : self.input_dim]
        elif x.shape[1] < self.input_dim:
            x = jnp.pad(x, ((0, 0), (0, self.input_dim - x.shape[1])))
        for i, width in enumerate(self.layers):
            x = nn.Dense(width, name=f"fc_{i}")(x)
            x = nn.relu(x)
            if self.use_bn:
                x = batch_norm(x, train=train, name=f"bn_{i}")
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class FcClassifier(nn.Module):
    input_dim: int
    layers: Sequence[int]
    output_dim: int
    dropout: float = 0.3
    use_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, width in enumerate(self.layers):
            x = nn.Dense(width, name=f"fc_{i}")(x)
            x = nn.relu(x)
            if self.use_bn:
                x = batch_norm(x, train=train, name=f"bn_{i}")
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="fc_out")(x)


class SimpleClassifier(nn.Module):
    embd_size: int
    output_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="C")(x)


class MaxPoolFc(nn.Module):
    hidden_size: int
    num_class: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, seq, hidden) → max over seq → fc → relu
        x = jnp.max(x, axis=1)
        return nn.relu(nn.Dense(self.num_class, name="fc")(x))
