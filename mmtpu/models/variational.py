"""Variational encoder variants (reference: models/msa/networks/lstmvar.py,
textcnnvar.py, xencoder.py — dead/unregistered there, rebuilt and registered
here for capability completeness).

All three follow the same VAE-encoder recipe the reference repeats verbatim:
the encoder's embedding width is doubled, split into (mu, log_var), and a
latent z = mu + eps * exp(0.5*log_var) is drawn by reparameterization
(lstmvar.py:53-61, textcnnvar.py:56-64, xencoder.py:38-46). At eval the
sample collapses to the mean (same convention as models/transformer.py).

Reference quirks handled explicitly:
- lstmvar.LSTMEncoder's 'attention' pooling is broken in the reference
  (Linear(H, H) applied to the LSTM's 2H-wide outputs — a shape crash,
  lstmvar.py:13,20,35). Flax Dense infers its input width, so the same
  attention formula simply works here over the 2H outputs.
- lstmvar.LSTMEncoder2 constructs `nn.relu()` (lstmvar.py:96) — an
  AttributeError at construction for its own DEFAULT embd_method; the
  intended relu-activated attention is implemented working here.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtpu.models.lstm import LSTMEncoder
from mmtpu.models.norm import batch_norm
from mmtpu.models.textcnn import TextCNN


def reparameterize(
    module: nn.Module, mu: jnp.ndarray, log_var: jnp.ndarray, train: bool
) -> jnp.ndarray:
    """z = mu + eps * std; eps ~ N(0, 1) when training, 0 at eval
    (reference reparameterize, e.g. xencoder.py:38-46)."""
    if train:
        eps = jax.random.normal(module.make_rng("sample"), mu.shape)
    else:
        eps = jnp.zeros_like(mu)
    return mu + eps * jnp.exp(0.5 * log_var)


def split_mu_logvar(
    embd: jnp.ndarray, width: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 2*width) → interleaved view (B, 2, width) → (mu, log_var)
    (reference `embd.view(-1, 2, hidden)`, lstmvar.py:71-74)."""
    x = embd.reshape(-1, 2, width)
    return x[:, 0, :], x[:, 1, :]


class VariationalLSTMEncoder(nn.Module):
    """LSTM encoder with a variational head (reference lstmvar.LSTMEncoder
    :6-78): the recurrence runs at 2*hidden_size so the pooled embedding
    splits into (mu, log_var) of hidden_size each. Returns (z, mu, log_var).

    Composes the production LSTMEncoder, so the fused wi/wh layout and the
    Pallas/XLA shape dispatch apply unchanged."""

    input_size: int
    hidden_size: int
    embd_method: str = "last"

    def get_embedding_size(self) -> int:
        return self.hidden_size

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths=None, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        embd = LSTMEncoder(
            self.input_size,
            2 * self.hidden_size,
            embd_method=self.embd_method,
            name="rnn",
        )(x, lengths=lengths, train=train)
        mu, log_var = split_mu_logvar(embd, self.hidden_size)
        z = reparameterize(self, mu, log_var, train)
        return z, mu, log_var


class VariationalLSTMEncoder2(nn.Module):
    """Reference lstmvar.LSTMEncoder2 (:81-137): a plain (non-variational)
    LSTM encoder whose attention pooling uses relu instead of tanh. Returns
    the pooled embedding only. The reference class crashes at construction
    for embd_method='attention' (its own default) because it instantiates
    the non-existent `nn.relu()` (lstmvar.py:96); the intended relu
    attention works here."""

    input_size: int
    hidden_size: int
    embd_method: str = "attention"

    def get_embedding_size(self) -> int:
        return self.hidden_size

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths=None, train: bool = False
    ) -> jnp.ndarray:
        assert self.embd_method in ("last", "attention", "maxpool")
        if self.embd_method != "attention":
            return LSTMEncoder(
                self.input_size,
                self.hidden_size,
                embd_method=self.embd_method,
                name="rnn",
            )(x, lengths=lengths, train=train)

        # relu-attention pooling over the full output sequence: run the
        # recurrence via a maxpool-free encoder call is not separable, so
        # use the fused sequence op directly (same param layout as
        # LSTMEncoder backend='fused').
        from mmtpu.ops.lstm import lstm_sequence

        xw = nn.Dense(4 * self.hidden_size, name="wi")(x)
        wh = self.param(
            "wh",
            nn.initializers.orthogonal(),
            (self.hidden_size, 4 * self.hidden_size),
        )
        h0 = jnp.zeros((x.shape[0], self.hidden_size), x.dtype)
        outputs, _ = lstm_sequence(
            xw, wh, h0, h0,
            lengths.astype(jnp.int32) if lengths is not None else None,
        )
        hidden = nn.relu(nn.Dense(self.hidden_size, name="attention_layer")(outputs))
        u = self.param(
            "attention_vector_weight",
            nn.initializers.lecun_normal(),
            (self.hidden_size, 1),
        )
        scores = (hidden @ u)[..., 0]  # (B, seq)
        if lengths is not None:
            steps = jnp.arange(outputs.shape[1])[None, :]
            scores = jnp.where(steps < lengths[:, None], scores, -jnp.inf)
        weights = nn.softmax(scores, axis=-1)[..., None]
        return jnp.sum(outputs * weights, axis=1)


class VariationalTextCNN(nn.Module):
    """TextCNN with a variational head (reference textcnnvar.TextCNN
    :6-84): conv trident → maxpool → concat → dropout → Dense to
    2*embd_size (+ReLU) → split (mu, log_var) → reparameterized z.
    Returns (z, mu, log_var)."""

    input_size: int
    embd_size: int = 128
    in_channels: int = 1
    out_channels: int = 128
    kernel_heights: Tuple[int, ...] = (3, 4, 5)
    dropout: float = 0.5

    def get_embedding_size(self) -> int:
        return self.embd_size

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        embd = TextCNN(
            self.input_size,
            embd_size=2 * self.embd_size,
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel_heights=self.kernel_heights,
            dropout=self.dropout,
            name="cnn",
        )(x, train=train)
        mu, log_var = split_mu_logvar(embd, self.embd_size)
        z = reparameterize(self, mu, log_var, train)
        return z, mu, log_var


class LinearVXE(nn.Module):
    """Linear variational cross-encoder (reference xencoder.LinearVXE
    :6-63): MLP encoder in→in/2 (ReLU+BN)→2*feature_dim, reparameterized
    latent, MLP decoder feature→out/2 (ReLU)→out. Returns
    (reconstruction, mu, log_var)."""

    input_dim: int
    output_dim: int
    feature_dim: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        h = nn.relu(nn.Dense(self.input_dim // 2, name="enc1")(x))
        h = batch_norm(h, train=train, name="enc_bn")
        h = nn.Dense(2 * self.feature_dim, name="enc2")(h)
        mu, log_var = split_mu_logvar(h, self.feature_dim)
        z = reparameterize(self, mu, log_var, train)
        r = nn.relu(nn.Dense(self.output_dim // 2, name="dec1")(z))
        reconstruction = nn.Dense(self.output_dim, name="dec2")(r)
        return reconstruction, mu, log_var
