"""Residual autoencoders (reference: models/msa/networks/autoencoder.py).

ResidualAE (:10): n cascaded encoder/decoder blocks where block i encodes
x_in = x + Σ previous reconstructions; returns (transition(x_in + x_out),
concat(latents)). ResidualXE (:79): same with a cross-modal output dim.
SimpleFcAE (:259): plain MLP AE returning (recon, latent).

Encoder stacks use LeakyReLU with the last layer bare; decoders use ReLU
with a bare final projection — reproduced exactly. (The reference's decoder
BN is constructed with mismatched dims and would crash if enabled; here BN
is applied on the layer output — documented deviation.)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm


class _EncoderStack(nn.Module):
    layers: Sequence[int]
    dropout: float
    use_bn: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, width in enumerate(self.layers):
            x = nn.Dense(width, name=f"fc_{i}")(x)
            if i < len(self.layers) - 1:  # last layer stays bare
                x = nn.leaky_relu(x)
                if self.use_bn:
                    x = batch_norm(x, train=train, name=f"bn_{i}")
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class _DecoderStack(nn.Module):
    layers: Sequence[int]  # reversed encoder layers + [out_dim]
    dropout: float
    use_bn: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        widths = list(self.layers)
        for i in range(len(widths) - 2):
            x = nn.Dense(widths[i + 1], name=f"fc_{i}")(x)
            x = nn.relu(x)
            if self.use_bn:
                x = batch_norm(x, train=train, name=f"bn_{i}")
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(widths[-1], name="fc_out")(x)


class ResidualAE(nn.Module):
    layers: Sequence[int]
    n_blocks: int
    input_dim: int
    dropout: float = 0.5
    use_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dec_layers = list(reversed(self.layers)) + [self.input_dim]
        x_in = x
        x_out = jnp.zeros_like(x)
        latents = []
        for i in range(self.n_blocks):
            x_in = x_in + x_out
            latent = _EncoderStack(
                self.layers, self.dropout, self.use_bn, name=f"encoder_{i}"
            )(x_in, train=train)
            x_out = _DecoderStack(
                dec_layers, self.dropout, self.use_bn, name=f"decoder_{i}"
            )(latent, train=train)
            latents.append(latent)
        h = x_in + x_out
        h = nn.Dense(self.input_dim, name="transition_0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.input_dim, name="transition_1")(h)
        return h, jnp.concatenate(latents, axis=-1)


class ResidualXE(nn.Module):
    """Cross-modal variant: transition maps input_dim → output_dim."""

    layers: Sequence[int]
    n_blocks: int
    input_dim: int
    output_dim: int
    dropout: float = 0.5
    use_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dec_layers = list(reversed(self.layers)) + [self.input_dim]
        x_in = x
        x_out = jnp.zeros_like(x)
        latents = []
        for i in range(self.n_blocks):
            x_in = x_in + x_out
            latent = _EncoderStack(
                self.layers, self.dropout, self.use_bn, name=f"encoder_{i}"
            )(x_in, train=train)
            x_out = _DecoderStack(
                dec_layers, self.dropout, self.use_bn, name=f"decoder_{i}"
            )(latent, train=train)
            latents.append(latent)
        h = x_in + x_out
        h = nn.Dense(self.input_dim, name="transition_0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.output_dim, name="transition_1")(h)
        return h, jnp.concatenate(latents, axis=-1)


class ResidualUnetAE(nn.Module):
    """U-Net-style fc autoencoder (reference: autoencoder.py:152-255).

    `layers` lists the encoder half only (the decoder mirrors it); each
    decoder level fuses the same-depth encoder activation by `fusion`
    ('concat' doubles the width, 'add' keeps it). n_blocks chains blocks
    residually like ResidualAE (block i consumes x_in + previous recon).
    Returns (final recon, {block_index: recon}) like the reference.
    Unregistered/dead from the reference CLI; provided for API completeness.
    """

    layers: Sequence[int]
    n_blocks: int
    input_dim: int
    dropout: float = 0.5
    use_bn: bool = False
    fusion: str = "concat"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        assert self.fusion in ("concat", "add"), "Only concat and add"
        depth = len(self.layers)

        def block(i: int, x_in: jnp.ndarray) -> jnp.ndarray:
            skips = []
            h = x_in
            for lvl, width in enumerate(self.layers):
                h = nn.Dense(width, name=f"encoder_{i}_fc_{lvl}")(h)
                h = nn.leaky_relu(h)
                if self.use_bn:
                    h = batch_norm(h, train=train, name=f"encoder_{i}_bn_{lvl}")
                if self.dropout > 0:
                    h = nn.Dropout(
                        self.dropout, deterministic=not train
                    )(h)
                skips.append(h)
            # decoder: deepest level first (no fusion), then fuse the
            # same-depth encoder output at each level
            widths = list(reversed(self.layers))[1:] + [self.input_dim]
            for lvl in range(depth):
                if lvl > 0:
                    skip = skips[depth - 1 - lvl]
                    h = (jnp.concatenate([h, skip], axis=-1)
                         if self.fusion == "concat" else h + skip)
                h = nn.Dense(widths[lvl], name=f"decoder_{i}_fc_{lvl}")(h)
                if lvl == depth - 1:
                    h = nn.relu(h)  # reference's final Sequential ends ReLU
                else:
                    h = nn.leaky_relu(h)
                    if self.dropout > 0:
                        h = nn.Dropout(
                            self.dropout, deterministic=not train
                        )(h)
            return h

        x_in = x
        x_out = jnp.zeros_like(x)
        outputs = {}
        for i in range(self.n_blocks):
            x_in = x_in + x_out
            x_out = block(i, x_in)
            outputs[i] = x_out
        return x_out, outputs


class SimpleFcAE(nn.Module):
    layers: Sequence[int]
    input_dim: int
    dropout: float = 0.5
    use_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        latent = x
        for i, width in enumerate(self.layers):
            latent = nn.Dense(width, name=f"enc_{i}")(latent)
            latent = nn.leaky_relu(latent)
            if self.use_bn:
                latent = batch_norm(latent, train=train, name=f"enc_bn_{i}")
            if self.dropout > 0:
                latent = nn.Dropout(self.dropout, deterministic=not train)(latent)
        widths = list(reversed(self.layers)) + [self.input_dim]
        recon = latent
        for i in range(len(widths) - 1):
            recon = nn.Dense(widths[i + 1], name=f"dec_{i}")(recon)
            recon = nn.relu(recon) if i == len(widths) - 2 else nn.leaky_relu(recon)
            if self.dropout > 0:
                recon = nn.Dropout(self.dropout, deterministic=not train)(recon)
        return recon, latent
