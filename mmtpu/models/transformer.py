"""VAE-transformer encoder (reference: models/msa/networks/transformer.py:11-240).

ResidualAttentionBlock: pre-LN self-attention and MLP sublayers, each with a
*post*-LN on the residual branch (the reference's unusual
``x + ln(attn(ln(x)))`` form, :60-62). Transformer: Dense proj → blocks →
seq avg-pool → sigmoid → μ/logσ² head with reparameterized sample.

The attention rides XLA's fused MHA path on the MXU; the reparameterize
sample uses an explicit 'sample' PRNG collection (functional, vs
torch.randn_like).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        h = nn.LayerNorm(name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head,
            dropout_rate=0.2,
            deterministic=not train,
            name="attn",
        )(h, h, mask=mask)
        x = x + nn.LayerNorm(name="ln_12")(h)

        m = nn.LayerNorm(name="ln_2")(x)
        m = nn.Dense(self.d_model * 4, name="c_fc")(m)
        m = nn.relu(m)
        m = nn.Dropout(0.1, deterministic=not train)(m)
        m = nn.Dense(self.d_model, name="c_proj")(m)
        x = x + nn.LayerNorm(name="ln_22")(m)
        return x


class Transformer(nn.Module):
    """Returns (z, mu, log_var)."""

    width: int
    layers: int
    heads: int
    embd_width: int

    def get_embedding_size(self) -> int:
        return self.embd_width

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = nn.Dense(self.embd_width, name="proj")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.embd_width, self.heads, name=f"resblock_{i}"
            )(x, train=train)
        x = jnp.mean(x, axis=1)  # embd_avgpool
        x = nn.sigmoid(x)
        muvar = nn.Dense(self.embd_width * 2, name="muvar")(x)
        muvar = muvar.reshape(-1, 2, self.embd_width)
        mu, log_var = muvar[:, 0, :], muvar[:, 1, :]
        if train:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape)
        else:
            # documented deviation: the reference samples randn_like in
            # BOTH train and eval (networks/transformer.py:134), so its
            # eval features are stochastic run-to-run. Deterministic
            # z = mu at eval is standard VAE inference and keeps the eval
            # steps rng-free; the train-time objective is identical.
            eps = jnp.zeros_like(mu)
        z = mu + eps * jnp.exp(0.5 * log_var)
        return z, mu, log_var
