"""LSTM sequence encoder (reference: models/msa/networks/lstm.py:8-123).

TPU-native realization of cuDNN LSTM: a `flax.linen.RNN` over an
OptimizedLSTMCell — the cell's four gate matmuls are fused into two GEMMs
that ride the MXU, and the time loop is an XLA `scan` (static length, no
recompilation per batch). Variable-length sequences use `seq_lengths`
masking, reproducing packed-sequence semantics (enforce_sorted=False).

Pooling methods: 'last' (true last state under masking), 'attention'
(Hierarchical-Attention-Networks style: softmax(u·tanh(W·h))·h), 'maxpool'.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm


class LSTMEncoder(nn.Module):
    """backend='fused' (default) routes through `lstm_sequence`
    (mmtpu/ops/lstm.py): fused wi/wh/b parameter layout, with a shape-based
    dispatch between the Pallas VMEM-resident kernel (where it measurably
    wins: long T / small H) and the XLA scan (parity shapes) — checkpoints
    are layout-identical either way. backend='rnn' keeps flax's scanned
    OptimizedLSTMCell (per-gate parameter layout, kept for comparison).

    setup-style so multi-encoder hosts (UttFusionModel) can call
    `project`/`pool` separately and batch the serial recurrence of several
    encoders into ONE scan (ops/lstm.lstm_sequence_stacked); param names
    ('wi', 'wh', 'attention_layer', 'attention_vector_weight') match the
    previous compact layout exactly, so checkpoints are unaffected."""

    input_size: int
    hidden_size: int
    embd_method: str = "last"
    backend: str = "fused"

    def setup(self):
        assert self.embd_method in ("last", "attention", "maxpool")
        if self.backend == "fused":
            self.wi = nn.Dense(4 * self.hidden_size)
            self.wh = self.param(
                "wh",
                nn.initializers.orthogonal(),
                (self.hidden_size, 4 * self.hidden_size),
            )
        if self.embd_method == "attention":
            self.attention_layer = nn.Dense(self.hidden_size)
            self.attention_vector_weight = self.param(
                "attention_vector_weight",
                nn.initializers.lecun_normal(),
                (self.hidden_size, 1),
            )

    def get_embedding_size(self) -> int:
        return self.hidden_size

    def project(self, x: jnp.ndarray):
        """Fused-backend input projection x@Wi + b (the parallel GEMM) and
        the recurrent weights — the pieces a host model needs to advance
        several encoders' recurrences in one stacked scan."""
        assert self.backend == "fused"
        return self.wi(x), self.wh

    def pool(
        self,
        outputs: jnp.ndarray,
        carry_h: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.embd_method == "last":
            return carry_h

        if lengths is not None:
            # mask padded steps out of attention/maxpool reductions
            steps = jnp.arange(outputs.shape[1])[None, :]
            valid = steps < lengths[:, None]
        else:
            valid = None

        if self.embd_method == "maxpool":
            if valid is not None:
                outputs = jnp.where(valid[..., None], outputs, -jnp.inf)
            return jnp.max(outputs, axis=1)

        # attention: softmax over seq of (tanh(W h + b) @ u)
        hidden = nn.tanh(self.attention_layer(outputs))
        scores = (hidden @ self.attention_vector_weight)[..., 0]  # (B, seq)
        if valid is not None:
            scores = jnp.where(valid, scores, -jnp.inf)
        weights = nn.softmax(scores, axis=-1)[..., None]
        return jnp.sum(outputs * weights, axis=1)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.backend == "fused":
            from mmtpu.ops.lstm import lstm_sequence

            xw, wh = self.project(x)
            h0 = jnp.zeros((x.shape[0], self.hidden_size), x.dtype)
            outputs, (carry_h, carry_c) = lstm_sequence(
                xw, wh, h0, h0,
                lengths.astype(jnp.int32) if lengths is not None else None,
            )
        else:
            # declared inline (not in setup) to keep the historical param
            # layout: flax's scope-sharing RNN surfaces the cell params as
            # a top-level 'OptimizedLSTMCell_0' entry, which is what
            # backend='rnn' checkpoints on disk contain
            rnn = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size), return_carry=True,
                name="rnn",
            )
            if lengths is not None:
                (carry_c, carry_h), outputs = rnn(x, seq_lengths=lengths)
            else:
                (carry_c, carry_h), outputs = rnn(x)

        return self.pool(outputs, carry_h, lengths)


def can_stack_pair(netA: nn.Module, netV: nn.Module, A, V) -> bool:
    """True when two sibling encoders' recurrences can be advanced by one
    stacked scan: both fused LSTMEncoders with equal hidden size over
    aligned (B, T) sequence inputs."""
    return (
        A is not None and V is not None
        and type(netA) is LSTMEncoder and type(netV) is LSTMEncoder
        and netA.backend == "fused" and netV.backend == "fused"
        and netA.hidden_size == netV.hidden_size
        and getattr(A, "ndim", 0) == 3 and getattr(V, "ndim", 0) == 3
        and A.shape[0] == V.shape[0] and A.shape[1] == V.shape[1]
    )


def encode_pair_stacked(netA: nn.Module, netV: nn.Module, A, V):
    """Encode two modalities' sequences with ONE scan over both LSTMs.

    Two separate lax.scans execute back-to-back on the TPU's single compute
    stream (2xT sequential steps of tiny matmuls); stacking the recurrences
    (ops/lstm.lstm_sequence_stacked) runs T steps of one batched
    contraction — mathematically identical, ~half the serial chain.
    Caller must have checked `can_stack_pair`."""
    from mmtpu.ops.lstm import lstm_sequence_stacked

    xw_a, wh_a = netA.project(A)
    xw_v, wh_v = netV.project(V)
    xw = jnp.stack([xw_a, xw_v])  # (2, B, T, 4H)
    wh = jnp.stack([wh_a, wh_v])
    h0 = jnp.zeros(xw.shape[:2] + (netA.hidden_size,), xw.dtype)
    outs, (h, _) = lstm_sequence_stacked(xw, wh, h0, h0)
    return netA.pool(outs[0], h[0]), netV.pool(outs[1], h[1])


class LSTMClassifier(nn.Module):
    """Two stacked bidirectional LSTMs + LayerNorm + BN head
    (reference: classifier.py:8-56). Returns (logits, features)."""

    input_size: int
    hidden_size: int
    fc1_size: int
    output_size: int
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        lengths = None
        if mask is not None:
            # mask (B, seq, feat) → lengths (B,) (reference mask2length :42-46)
            lengths = jnp.sum(jnp.mean(mask, axis=-1).astype(jnp.int32), axis=-1)

        def bi_lstm(name, inp):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size),
                return_carry=True,
                name=f"{name}_fwd",
            )
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size),
                return_carry=True,
                reverse=True,
                keep_order=True,
                name=f"{name}_bwd",
            )
            (c_f, h_f), out_f = (
                fwd(inp, seq_lengths=lengths) if lengths is not None else fwd(inp)
            )
            (c_b, h_b), out_b = (
                bwd(inp, seq_lengths=lengths) if lengths is not None else bwd(inp)
            )
            return jnp.concatenate([h_f, h_b], -1), jnp.concatenate([out_f, out_b], -1)

        h1, out1 = bi_lstm("rnn1", x)
        out1 = nn.LayerNorm(name="layer_norm")(out1)
        h2, _ = bi_lstm("rnn2", out1)

        h = jnp.concatenate([h1, h2], axis=-1)  # (B, 4*hidden)
        h = batch_norm(h, train=train, name="bn")
        h = nn.Dense(self.fc1_size, name="fc1")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.relu(h)
        o = nn.Dense(self.output_size, name="fc2")(h)
        return o, h


# Reference ships a near-duplicate LSTMEncoder2 (lstm.py:67, identical but
# for a broken relu-attention variant); alias for registry/name parity.
LSTMEncoder2 = LSTMEncoder
