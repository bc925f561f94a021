"""Self-MM: self-supervised multi-task MSA (reference: models/msa/self_mm.py:30-458).

AuViSubNet (networks/avsubset.py:6): packed-LSTM over variable-length audio/
video → dropout → Dense (masked final state via seq_lengths, reproducing
enforce_sorted=False packing).

Self_MM: BERT text [CLS] + AuViSubNet audio/video, a fusion regressor and
three unimodal regressor heads. Returns the reference's dict of
predictions / features / features_pre_activation keyed by modality name.
The self-generated-label machinery lives in mmtpu/train/self_mm_step.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

DEFAULT_TEXT_LENGTH = 50


class AuViSubNet(nn.Module):
    in_size: int
    hidden_size: int
    out_size: int
    num_layers: int = 1
    dropout: float = 0.2
    bidirectional: bool = False

    def get_embedding_size(self) -> int:
        return self.out_size

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        h = x
        final_h = None
        for layer in range(self.num_layers):
            # torch nn.LSTM semantics: BOTH directions of layer L consume
            # layer L-1's (concatenated) outputs — snapshot before the
            # forward direction overwrites h
            layer_in = h
            rnn = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size),
                return_carry=True,
                name=f"rnn_l{layer}",
            )
            if lengths is not None:
                (c, hidden), h = rnn(layer_in, seq_lengths=lengths)
            else:
                (c, hidden), h = rnn(layer_in)
            final_h = hidden
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden_size),
                    return_carry=True, reverse=True, keep_order=True,
                    name=f"rnn_l{layer}_bwd",
                )
                (cb, hb), hseq_b = (
                    bwd(layer_in, seq_lengths=lengths)
                    if lengths is not None
                    else bwd(layer_in)
                )
                final_h = jnp.concatenate([hidden, hb], axis=-1)
                h = jnp.concatenate([h, hseq_b], axis=-1)
            # torch applies dropout BETWEEN stacked layers (not after the
            # last) when num_layers > 1
            if layer < self.num_layers - 1 and self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = nn.Dropout(self.dropout, deterministic=not train)(final_h)
        return nn.Dense(self.out_size, name="linear_1")(out)


class Self_MM(nn.Module):
    audio_encoder: nn.Module
    video_encoder: nn.Module
    text_encoder: nn.Module
    need_data_aligned: bool
    audio_out: int
    video_out: int
    text_out: int
    post_fusion_dropout: float
    post_fusion_dim: int
    post_text_dropout: float
    post_text_dim: int
    post_audio_dropout: float
    post_audio_dim: int
    post_video_dropout: float
    post_video_dim: int
    feature_manager: Any = None   # manager specs (sizing) — state lives in the step
    labels_manager: Any = None
    center_manager: Any = None
    H: float = 3.0
    update_every: int = 1

    @nn.compact
    def __call__(
        self,
        A: Tuple[jnp.ndarray, Any],
        V: Tuple[jnp.ndarray, Any],
        T: jnp.ndarray,
        *,
        train: bool = False,
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        audio, audio_lengths = A
        video, video_lengths = V
        text_raw = T

        # text: BERT rows (ids/mask/segments); lengths from the mask row
        mask_len = jnp.sum(text_raw[:, 1, :], axis=1).astype(jnp.int32)
        text_lengths = jnp.where(mask_len == 0, DEFAULT_TEXT_LENGTH, mask_len)
        text = self.text_encoder(text_raw, train=train)[:, 0, :]

        # faithful to MML_Suite (self_mm.py:156-161): NOT-aligned routes the
        # TEXT lengths into the audio/video packed-LSTMs, aligned routes the
        # per-modality lengths. (Upstream Self-MM has this the other way
        # around — the reference inverted it; we match the reference.)
        if not self.need_data_aligned:
            audio = self.audio_encoder(audio, text_lengths, train=train)
            video = self.video_encoder(video, text_lengths, train=train)
        else:
            audio = self.audio_encoder(audio, audio_lengths, train=train)
            video = self.video_encoder(video, video_lengths, train=train)

        fusion_h = jnp.concatenate([text, audio, video], axis=-1)
        fusion_h = nn.Dropout(self.post_fusion_dropout, deterministic=not train)(fusion_h)
        fusion_h = nn.relu(nn.Dense(self.post_fusion_dim, name="post_fusion_layer_1")(fusion_h))

        text_h = nn.Dropout(self.post_text_dropout, deterministic=not train)(text)
        text_h = nn.relu(nn.Dense(self.post_text_dim, name="post_text_layer_1")(text_h))
        audio_h = nn.Dropout(self.post_audio_dropout, deterministic=not train)(audio)
        audio_h = nn.relu(nn.Dense(self.post_audio_dim, name="post_audio_layer_1")(audio_h))
        video_h = nn.Dropout(self.post_video_dropout, deterministic=not train)(video)
        video_h = nn.relu(nn.Dense(self.post_video_dim, name="post_video_layer_1")(video_h))

        x_f = nn.relu(nn.Dense(self.post_fusion_dim, name="post_fusion_layer_2")(fusion_h))
        out_fusion = nn.Dense(1, name="post_fusion_layer_3")(x_f)
        x_t = nn.relu(nn.Dense(self.post_text_dim, name="post_text_layer_2")(text_h))
        out_text = nn.Dense(1, name="post_text_layer_3")(x_t)
        x_a = nn.relu(nn.Dense(self.post_audio_dim, name="post_audio_layer_2")(audio_h))
        out_audio = nn.Dense(1, name="post_audio_layer_3")(x_a)
        x_v = nn.relu(nn.Dense(self.post_video_dim, name="post_video_layer_2")(video_h))
        out_video = nn.Dense(1, name="post_video_layer_3")(x_v)

        return {
            "predictions": {
                "multimodal": out_fusion,
                "audio": out_audio,
                "video": out_video,
                "text": out_text,
            },
            "features": {
                "multimodal": fusion_h,
                "audio": audio_h,
                "video": video_h,
                "text": text_h,
            },
            "features_pre_activation": {
                "audio": audio,
                "video": video,
                "text": text,
            },
        }
