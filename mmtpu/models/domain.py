"""Domain-invariant and multimodal sequence encoders (reference:
models/msa/networks/div_encoder.py, seq_encoder.py, language_embedding.py).

DIVEncoder is consumed by the reference GatedTransformer's gated forward —
a path that is itself unreachable there (gated_transformer.py:389 rebinds
`disc_labels` from list to tensor, so the second loop iteration crashes;
only forward_transformer is live, which MulT uses). SeqEncoder and
LanguageEmbeddingLayer are exported (networks/__init__.py:2-9) but never
constructed outside MulT's CNN variant. All three are rebuilt here as
standalone registered modules for capability completeness.

Layout convention: batch-first (B, T, F) throughout, as everywhere in
mmtpu — the reference uses torch's seq-first (T, B, F) for these modules.
Recurrences are XLA scans (flax nn.RNN) with explicit `lengths` masking
replacing pack_padded_sequence.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.modalities import Modality


def masked_avg_pool(
    x: jnp.ndarray, lengths: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """(B, T, F) → (B, F): sum of valid steps / lengths (reference
    _masked_avg_pool, div_encoder.py:98-113 / seq_encoder.py:187-198)."""
    if mask is None:
        steps = jnp.arange(x.shape[1])[None, :]
        mask = (steps < lengths[:, None]).astype(x.dtype)
    if mask.ndim == 2:
        mask = mask[..., None]
    return (x * mask).sum(axis=1) / lengths[:, None].astype(x.dtype)


def _bi_rnn(
    name: str,
    rnn_type: str,
    hidden: int,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One bidirectional recurrent layer. Returns (outputs (B,T,2H),
    h_fwd (B,H), h_bwd (B,H))."""
    def cell():
        if rnn_type == "gru":
            return nn.GRUCell(hidden)
        return nn.OptimizedLSTMCell(hidden)

    fwd = nn.RNN(cell(), return_carry=True, name=f"{name}_fwd")
    bwd = nn.RNN(
        cell(), return_carry=True, reverse=True, keep_order=True,
        name=f"{name}_bwd",
    )
    if lengths is not None:
        carry_f, out_f = fwd(x, seq_lengths=lengths)
        carry_b, out_b = bwd(x, seq_lengths=lengths)
    else:
        carry_f, out_f = fwd(x)
        carry_b, out_b = bwd(x)
    # LSTM carry is (c, h); GRU carry is h
    h_f = carry_f[1] if isinstance(carry_f, tuple) else carry_f
    h_b = carry_b[1] if isinstance(carry_b, tuple) else carry_b
    return jnp.concatenate([out_f, out_b], axis=-1), h_f, h_b


class DIVEncoder(nn.Module):
    """Domain-invariant encoder over a modality pair (reference
    div_encoder.DIVEncoder:9-251): linear or bidirectional-RNN projections
    of both streams to a shared space, 'avg'/'last' reduction, per-stream
    dropout, and an optional domain discriminator whose outputs/labels feed
    an adversarial loss.

    Returns (enc_l, enc_o, disc_out, disc_labels); the last two are None
    without `use_disc`. disc_out is sigmoid((2B,)) over [enc_l; enc_o]
    stacked along batch; labels are 0 for the first modality, 1 for the
    second (reference :231-250)."""

    in_size: int
    out_size: int
    prj_type: str = "linear"
    use_disc: bool = False
    rnn_type: Optional[str] = None
    rdc_type: Optional[str] = None
    p_t: float = 0.0
    p_o: float = 0.0

    @nn.compact
    def __call__(
        self,
        input_t: jnp.ndarray,
        input_o: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        if self.prj_type == "linear":
            if self.rdc_type == "avg":
                if lengths is None:
                    raise ValueError("rdc_type='avg' needs lengths")
                enc_l = masked_avg_pool(input_t, lengths, mask)
                enc_o = masked_avg_pool(input_o, lengths, mask)
            elif self.rdc_type is None:
                enc_l, enc_o = input_t, input_o
            else:
                raise ValueError(
                    "Reduce method must be 'avg' or None for linear projection"
                )
            enc_l = nn.Dense(self.out_size, name="encode_l")(enc_l)
            enc_o = nn.Dense(self.out_size, name="encode_o")(enc_o)
        elif self.prj_type == "rnn":
            if self.rnn_type is None:
                raise ValueError(
                    "rnn_type must be specified when using RNN projection"
                )
            out_l, hf_l, hb_l = _bi_rnn(
                "encode_l", self.rnn_type.lower(), self.out_size, input_t,
                lengths,
            )
            out_o, hf_o, hb_o = _bi_rnn(
                "encode_o", self.rnn_type.lower(), self.out_size, input_o,
                lengths,
            )
            if self.rdc_type == "last":
                enc_l = (hf_l + hb_l) / 2
                enc_o = (hf_o + hb_o) / 2
            elif self.rdc_type == "avg":
                if lengths is None:
                    raise ValueError("rdc_type='avg' needs lengths")
                enc_l = masked_avg_pool(out_l, lengths, mask)
                enc_o = masked_avg_pool(out_o, lengths, mask)
                # average the two directions' halves (reference :224-225)
                half = self.out_size
                enc_l = (enc_l[:, :half] + enc_l[:, half:]) / 2
                enc_o = (enc_o[:, :half] + enc_o[:, half:]) / 2
            else:
                raise ValueError(
                    "Reduce method must be 'last' or 'avg' for RNN projection"
                )
        else:
            raise ValueError("prj_type must be either 'linear' or 'rnn'")

        enc_l = nn.Dropout(self.p_t, deterministic=not train)(enc_l)
        enc_o = nn.Dropout(self.p_o, deterministic=not train)(enc_o)

        disc_out = disc_labels = None
        if self.use_disc:
            both = jnp.concatenate([enc_l, enc_o], axis=0)
            h = nn.relu(nn.Dense(4 * self.out_size, name="disc_fc1")(both))
            disc_out = nn.sigmoid(nn.Dense(1, name="disc_fc2")(h))[..., 0]
            b = enc_l.shape[0]
            disc_labels = jnp.concatenate(
                [jnp.zeros((b,), enc_l.dtype), jnp.ones((b,), enc_l.dtype)]
            )
        return enc_l, enc_o, disc_out, disc_labels


class SeqEncoder(nn.Module):
    """Trimodal sequence encoder (reference seq_encoder.SeqEncoder:10-297):
    projects audio/text/video sequences to a shared attention_dim via
    linear, CNN (1-D same-padding conv, no bias), or bidirectional
    LSTM/GRU stacks. Returns {Modality: (seq (B,T,D), pooled (B,D))}.

    Faithful details: the linear/CNN paths pool by masked average; the RNN
    path projects the concatenated final hidden pair through Dense+LayerNorm
    (reference takes h_out[0]/h_out[1] — the FIRST layer's directions — a
    quirk that only equals the usual last-layer choice at num_enc_layers=1;
    reproduced here by pooling the first layer's states)."""

    orig_dim_a: int
    orig_dim_t: int
    orig_dim_v: int
    attention_dim: int
    num_enc_layers: int = 1
    proj_type: str = "linear"
    a_ksize: int = 3
    t_ksize: int = 3
    v_ksize: int = 3

    @nn.compact
    def __call__(
        self,
        input_t: jnp.ndarray,
        input_v: jnp.ndarray,
        input_a: jnp.ndarray,
        lengths: jnp.ndarray,
        train: bool = False,
    ) -> Dict[Modality, Tuple[jnp.ndarray, jnp.ndarray]]:
        pt = self.proj_type.lower()
        streams = {
            Modality.TEXT: (input_t, self.orig_dim_t, self.t_ksize),
            Modality.VIDEO: (input_v, self.orig_dim_v, self.v_ksize),
            Modality.AUDIO: (input_a, self.orig_dim_a, self.a_ksize),
        }
        out: Dict[Modality, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        for modality, (x, orig_dim, ksize) in streams.items():
            tag = str(modality)[0].lower()  # 'a'/'t'/'v'
            if pt == "linear":
                seq = nn.Dense(self.attention_dim, name=f"proj_{tag}")(x)
                pooled = masked_avg_pool(seq, lengths)
            elif pt == "cnn":
                seq = nn.Conv(
                    self.attention_dim,
                    kernel_size=(ksize,),
                    padding="SAME",
                    use_bias=False,
                    name=f"proj_{tag}",
                )(x)
                pooled = masked_avg_pool(seq, lengths)
            elif pt in ("lstm", "gru"):
                h = x
                first_h = None
                for layer in range(self.num_enc_layers):
                    h, h_f, h_b = _bi_rnn(
                        f"rnn_{tag}_{layer}", pt, orig_dim, h, lengths
                    )
                    if layer == 0:
                        first_h = jnp.concatenate([h_f, h_b], axis=-1)
                pooled = nn.LayerNorm(name=f"layer_norm_{tag}")(
                    nn.Dense(self.attention_dim, name=f"proj_{tag}_h")(first_h)
                )
                seq = nn.Dense(self.attention_dim, name=f"proj_{tag}_seq")(h)
            else:
                raise ValueError(
                    "proj_type must be one of: 'linear', 'cnn', 'lstm', 'gru'"
                )
            out[modality] = (seq, pooled)
        return out


class LanguageEmbeddingLayer(nn.Module):
    """Text embedding via pretrained BERT or a GloVe-style embedding table
    (reference language_embedding.LanguageEmbeddingLayer:8-142).

    use_bert=True routes through BertTextEncoder (same local-checkpoint
    `from_pt` ingestion path as Self-MM); otherwise an embedding table of
    `vocab_size` x `embedding_dim` is learned (the reference sizes it by
    len(word2id) — pass the vocabulary size directly here)."""

    use_bert: bool
    vocab_size: Optional[int] = None
    embedding_dim: Optional[int] = None
    bert_pretrained_path: str = "pretrained_model/bert_en"

    @nn.compact
    def __call__(
        self,
        sentences: Optional[jnp.ndarray] = None,
        bert_sent: Optional[jnp.ndarray] = None,
        bert_sent_type: Optional[jnp.ndarray] = None,
        bert_sent_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.use_bert:
            if any(x is None for x in (bert_sent, bert_sent_type, bert_sent_mask)):
                raise ValueError(
                    "All BERT inputs must be provided when use_bert=True"
                )
            from mmtpu.models.bert_text import BertTextEncoder

            # BertTextEncoder's packed layout: rows = ids / mask / type
            text = jnp.stack(
                [bert_sent, bert_sent_mask, bert_sent_type], axis=1
            )
            return BertTextEncoder(
                pretrained_path=self.bert_pretrained_path, name="bert_model"
            )(text, train=train)

        if sentences is None:
            raise ValueError(
                "Sentences input must be provided when use_bert=False"
            )
        if self.vocab_size is None or self.embedding_dim is None:
            raise ValueError(
                "For GloVe embeddings, both vocab_size and embedding_dim "
                "must be provided"
            )
        return nn.Embed(
            self.vocab_size, self.embedding_dim, name="embed"
        )(sentences.astype(jnp.int32))
