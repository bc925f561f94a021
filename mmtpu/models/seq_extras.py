"""Sequence-model building blocks: sinusoidal positions, gated transformer
encoder, early-fusion classifier head.

References: models/msa/networks/positional_embedding.py:56 (sinusoidal
embeddings), gated_transformer.py:77,249 (gated encoder layer + stack with
memory/attention sigmoid gates over pre-norm attention), and
classifier.py:120 (EF_model_AL). MultiheadAttention
(multihead_attention.py:8) maps to flax's fused MHA (MXU path).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def sinusoidal_positional_embedding(
    num_positions: int, embedding_dim: int
) -> jnp.ndarray:
    """(num_positions, embedding_dim) "Attention Is All You Need" table —
    half sin / half cos with the reference's 1e4 frequency base."""
    half = embedding_dim // 2
    freq = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / max(half - 1, 1)))
    args = jnp.arange(num_positions)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class SinusoidalPositionalEmbedding(nn.Module):
    embedding_dim: int
    padding_idx: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, seq, dim) → x + positions (broadcast)."""
        table = sinusoidal_positional_embedding(x.shape[1], self.embedding_dim)
        return x + table[None, :, :]


def future_mask(length: int) -> jnp.ndarray:
    """Causal mask: True where attention is allowed."""
    return jnp.tril(jnp.ones((length, length), bool))


class GatedTransformerEncoderLayer(nn.Module):
    """Pre-norm self-attention + FFN with sigmoid memory/attention gates."""

    embed_dim: int
    num_heads: int = 4
    attn_dropout: float = 0.1
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    attn_mask: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_k: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        residual = x
        h = nn.LayerNorm(name="ln_0")(x)
        kv = h if x_k is None else nn.LayerNorm(name="ln_0_k")(x_k)
        mask = None
        if self.attn_mask and x_k is None:
            mask = future_mask(h.shape[1])[None, None, :, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.attn_dropout,
            deterministic=not train,
            name="self_attn",
        )(h, kv, mask=mask)
        attn = nn.Dropout(self.res_dropout, deterministic=not train)(attn)
        # attention gate: sigmoid over [residual; attn]
        gate_in = jnp.concatenate([residual, attn], axis=-1)
        a_gate = nn.sigmoid(nn.Dense(self.embed_dim, name="attention_projection")(gate_in))
        m_gate = nn.sigmoid(nn.Dense(self.embed_dim, name="memory_projection")(gate_in))
        x = m_gate * residual + a_gate * attn

        residual = x
        h = nn.LayerNorm(name="ln_1")(x)
        h = nn.relu(nn.Dense(4 * self.embed_dim, name="feed_forward_one")(h))
        h = nn.Dropout(self.relu_dropout, deterministic=not train)(h)
        h = nn.Dense(self.embed_dim, name="feed_forward_two")(h)
        h = nn.Dropout(self.res_dropout, deterministic=not train)(h)
        return residual + h


class GatedTransformer(nn.Module):
    """Stack of gated encoder layers with sinusoidal positions
    (reference GatedTransformer :249-476)."""

    input_dim: int
    embed_dim: int
    num_heads: int = 4
    layers: int = 4
    attn_dropout: float = 0.1
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    embed_dropout: float = 0.25
    attn_mask: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_k: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        h = nn.Dense(self.embed_dim, name="proj")(x) * math.sqrt(self.embed_dim)
        h = SinusoidalPositionalEmbedding(self.embed_dim, name="pos")(h)
        h = nn.Dropout(self.embed_dropout, deterministic=not train)(h)
        k = None
        if x_k is not None:
            k = nn.Dense(self.embed_dim, name="proj_k")(x_k) * math.sqrt(self.embed_dim)
            k = SinusoidalPositionalEmbedding(self.embed_dim, name="pos_k")(k)
        for i in range(self.layers):
            h = GatedTransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.attn_dropout,
                self.relu_dropout, self.res_dropout, self.attn_mask,
                name=f"layer_{i}",
            )(h, k if i == 0 else None, train=train)
        return nn.LayerNorm(name="ln_final")(h)


class EFModelAL(nn.Module):
    """Early-fusion acoustic+lexical head (reference classifier.py:120-167)."""

    fc_classifier: nn.Module
    lstm_classifier: nn.Module
    out_dim_a: int
    out_dim_v: int
    fusion_size: int
    num_class: int
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self, A_feat: jnp.ndarray, L_feat: jnp.ndarray,
        L_mask: Optional[jnp.ndarray] = None, train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a_out = self.fc_classifier(A_feat, train=train)
        _, l_out = self.lstm_classifier(L_feat, L_mask, train=train)
        feat = jnp.concatenate([a_out, l_out], axis=-1)
        feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        feat = nn.relu(nn.Dense(self.fusion_size, name="out1")(feat))
        out = nn.Dense(self.num_class, name="out2")(
            nn.Dropout(self.dropout, deterministic=not train)(feat)
        )
        return out, feat
