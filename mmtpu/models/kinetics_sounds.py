"""Kinetics-Sounds audio/video fusion (reference: models/kinetics_sounds.py:21-259).

Audio: 3 ConvBlocks with avg-pools → flatten → ReLU/Dropout → fc ×2.
Video: MLP over precomputed 400-d features. Fusion: concat → fc → ReLU →
Dropout → fc → ReLU → fc_out (26 classes).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.conv import avg_pool as _avg_pool

NUM_CLASSES = 26


class KineticsSoundsAudioEncoder(nn.Module):
    conv_block_one: Any
    conv_block_two: Any
    conv_block_three: Any
    kernel_size_one: Any = (2, 2)
    kernel_size_two: Any = (4, 4)
    kernel_size_three: Any = (4, 8)
    dropout_one: float = 0.554
    dropout_two: float = 0.336
    fc_one_input_size: int = 512
    fc_one_output_size: int = 64
    fc_two_output_size: int = 64

    def get_embedding_size(self) -> int:
        return self.fc_two_output_size

    @nn.compact
    def __call__(self, audio: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = audio if audio.ndim == 4 else audio[..., None]
        x = self.conv_block_one(x, train=train)
        x = _avg_pool(x, self.kernel_size_one)
        x = self.conv_block_two(x, train=train)
        x = _avg_pool(x, self.kernel_size_two)
        x = self.conv_block_three(x, train=train)
        x = _avg_pool(x, self.kernel_size_three)
        x = x.reshape(x.shape[0], -1)
        if x.shape[1] > self.fc_one_input_size:
            x = x[:, : self.fc_one_input_size]
        elif x.shape[1] < self.fc_one_input_size:
            x = jnp.pad(x, ((0, 0), (0, self.fc_one_input_size - x.shape[1])))
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_one, deterministic=not train)(x)
        x = nn.Dense(self.fc_one_output_size, name="fc_one")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_two, deterministic=not train)(x)
        return nn.Dense(self.fc_two_output_size, name="fc_two")(x)


class KineticsSoundsVideoEncoder(nn.Module):
    fc_one_input_size: int = 400
    hidden_dim_one: int = 256
    hidden_dim_two: int = 128
    dropout: float = 0.56

    def get_embedding_size(self) -> int:
        return self.hidden_dim_two

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim_one, name="fc_one")(video)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim_two, name="fc_two")(x)
        return nn.relu(x)


class KineticsSounds(nn.Module):
    audio_encoder: nn.Module
    video_encoder: nn.Module
    hidden_dim_one: int
    hidden_dim_two: int
    dropout: float = 0.38

    @nn.compact
    def __call__(
        self,
        A: Optional[jnp.ndarray] = None,
        V: Optional[jnp.ndarray] = None,
        *,
        is_embd_A: bool = False,
        is_embd_V: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:
        assert A is not None or V is not None
        assert not (is_embd_A and is_embd_V)
        # reference substitutes a ZERO EMBEDDING for an absent modality
        # (kinetics_sounds.py:130-131) — meaningful with is_embd_X=True
        # (the C-MAM substitution path); with is_embd_X=False the encoder
        # sees the embedding-shaped zeros and fails, as it does there
        if A is None:
            A = jnp.zeros(
                (V.shape[0], self.audio_encoder.get_embedding_size()),
                V.dtype,
            )
        if V is None:
            V = jnp.zeros(
                (A.shape[0], self.video_encoder.get_embedding_size()),
                A.dtype,
            )
        audio = A if is_embd_A else self.audio_encoder(A, train=train)
        video = V if is_embd_V else self.video_encoder(V, train=train)
        fused = jnp.concatenate([audio, video], axis=1)
        x = nn.Dense(self.hidden_dim_one, name="fc_one")(fused)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim_two, name="fc_two")(x)
        x = nn.relu(x)
        return nn.Dense(NUM_CLASSES, name="fc_out")(x)

    def encode(self, A, V, train: bool = False):
        return (
            self.audio_encoder(A, train=train),
            self.video_encoder(V, train=train),
        )
