"""Fusion primitives: MaxOut, GatedBiModalNetwork, MultimodalPooling.

Reference: models/maxout.py:6, models/gates/gated_bimodal.py:6,
models/pooling.py:6-127. Small elementwise+GEMM blocks that XLA fuses; the
Pallas fused-MLP kernel path (mmtpu/ops) targets the surrounding classifier
stacks, not these."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MaxOut(nn.Module):
    """Element-wise max over `num_units` parallel Dense transforms."""

    input_dim: int
    output_dim: int
    num_units: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # One fused GEMM of shape (in, units*out) — better MXU utilisation
        # than `num_units` separate (in, out) GEMMs.
        y = nn.Dense(
            self.output_dim * self.num_units, use_bias=self.use_bias, name="units"
        )(x)
        y = y.reshape(*x.shape[:-1], self.num_units, self.output_dim)
        return jnp.max(y, axis=-2)


class GatedBiModalNetwork(nn.Module):
    """GMU: tanh projections of both modalities + sigmoid scalar gate."""

    input_one_dim: int
    input_two_dim: int
    output_one_dim: int
    output_two_dim: int
    use_bias: bool = False

    @nn.compact
    def __call__(
        self, modality_one: jnp.ndarray, modality_two: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        out_one = nn.tanh(
            nn.Dense(self.output_one_dim, use_bias=self.use_bias, name="fc_one")(
                modality_one
            )
        )
        out_two = nn.tanh(
            nn.Dense(self.output_two_dim, use_bias=self.use_bias, name="fc_two")(
                modality_two
            )
        )
        combined = jnp.concatenate([out_one, out_two], axis=1)
        gate = nn.sigmoid(
            nn.Dense(1, use_bias=self.use_bias, name="hidden_sigmoid")(combined)
        )
        return gate * out_one + (1.0 - gate) * out_two


class MultimodalPooling(nn.Module):
    """max / avg / sum / attention / gated pooling over two modalities."""

    input_dim_a: int
    input_dim_b: int
    output_dim: int
    pooling_type: str = "gated"
    hidden_dim: int = 0
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x_a: jnp.ndarray, x_b: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        hidden = self.hidden_dim or max(self.input_dim_a, self.input_dim_b)
        a = nn.tanh(nn.Dense(self.output_dim, name="proj_a")(x_a))
        b = nn.tanh(nn.Dense(self.output_dim, name="proj_b")(x_b))
        if self.dropout > 0:
            a = nn.Dropout(self.dropout, deterministic=not train)(a)
            b = nn.Dropout(self.dropout, deterministic=not train)(b)

        kind = self.pooling_type.lower()
        if kind == "max":
            return jnp.maximum(a, b)
        if kind in ("avg", "average"):
            return (a + b) / 2.0
        if kind == "sum":
            return a + b
        combined = jnp.concatenate([a, b], axis=1)
        if kind == "attention":
            s = nn.tanh(nn.Dense(hidden, name="att_hidden")(combined))
            scores = nn.softmax(nn.Dense(2, name="att_out")(s), axis=1)
            return scores[:, 0:1] * a + scores[:, 1:2] * b
        if kind == "gated":
            g = nn.tanh(nn.Dense(hidden, name="gate_hidden")(combined))
            gate = nn.sigmoid(nn.Dense(1, name="gate_out")(g))
            return gate * a + (1.0 - gate) * b
        raise ValueError(f"Unknown pooling type: {self.pooling_type}")
