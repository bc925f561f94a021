"""GCNet conversation-graph family (reference: models/msa/gcnet.py:14,115,
models/msa/networks/graph_utils.py:9-148, matching_attention.py:18).

TPU-first redesign of the torch_geometric RGCN pipeline. The reference
builds a ragged flat node list plus dynamic `edge_index`/`edge_type`
tensors per batch (`batch_graphify`) and loops Python-side over timesteps
for attention — both hostile to XLA's static-shape compilation. Here:

- Conversations stay padded `[B, T, F]`; the window/speaker edge structure
  becomes dense boolean adjacency masks `[B, R, T, T]` computed with pure
  tensor ops (broadcasted index arithmetic), so the whole model is one
  static program.
- RGCNConv / GraphConv become batched matmuls over those masks — they ride
  the MXU instead of scatter/gather. Semantics match torch_geometric's
  documented math: RGCNConv with per-relation mean aggregation + root
  weight + bias; GraphConv with sum aggregation.
- MatchingAttention's per-timestep Python loop (gcnet.py:103-111)
  collapses into a single einsum over all (candidate, memory) pairs.

Edge-type index order is fixed canonically (temporal: past/now/future;
speaker: "00","01","10","11"). The reference derives indices from Python
set iteration order (graph_utils.py:93-96), which is process-dependent —
since relation weights are symmetric at init, the fixed order is
semantically equivalent and reproducible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "window_adjacency",
    "temporal_relation_adjacency",
    "speaker_relation_adjacency",
    "DenseRGCNConv",
    "DenseGraphConv",
    "MatchingAttention",
    "GraphNetwork",
    "GraphModel",
]


# ---------------------------------------------------------------------------
# Dense graph construction (replaces graph_utils.edge_perms/batch_graphify)
# ---------------------------------------------------------------------------

def window_adjacency(
    T: int,
    lengths: jnp.ndarray,
    window_past: int,
    window_future: int,
) -> jnp.ndarray:
    """Receiver-major adjacency A[b, j, i] = 1 iff edge (src=i → tgt=j).

    Reference `edge_perms` (graph_utils.py:9-49) emits, for every node i,
    edges (i, j) for all j within [i - window_past, i + window_future]
    clipped to the conversation; -1 means unlimited. Messages flow
    source→target (torch_geometric default), so receiver j aggregates from
    senders i with j - i ∈ [-window_past, window_future].
    """
    idx = jnp.arange(T)
    delta = idx[None, :, None] - idx[None, None, :]  # delta[_, j, i] = j - i
    ok = jnp.ones((1, T, T), bool)
    if window_past != -1:
        ok = ok & (delta >= -window_past)
    if window_future != -1:
        ok = ok & (delta <= window_future)
    valid = idx[None, :] < lengths[:, None]  # [B, T]
    return ok & valid[:, :, None] & valid[:, None, :]


def temporal_relation_adjacency(adj: jnp.ndarray) -> jnp.ndarray:
    """Split adjacency into the 3 temporal relations [B, 3, T, T].

    Reference labels edge (src, tgt): tgt > src → "past", tgt == src →
    "now", tgt < src → "future" (graph_utils.py:124-130; the labels read
    inverted because they describe the *target's* position relative to the
    message's recipient). Canonical index order: past=0, now=1, future=2.
    """
    T = adj.shape[-1]
    idx = jnp.arange(T)
    delta = idx[None, :, None] - idx[None, None, :]  # j - i (tgt - src)
    past = adj & (delta > 0)
    now = adj & (delta == 0)
    future = adj & (delta < 0)
    return jnp.stack([past, now, future], axis=1)


def speaker_relation_adjacency(
    adj: jnp.ndarray, qmask: jnp.ndarray, n_speakers: int
) -> jnp.ndarray:
    """Split adjacency into n_speakers² speaker relations [B, n², T, T].

    Relation id for edge (src=i → tgt=j) is `q[tgt] * n + q[src]`,
    the canonical ordering of the reference's "{speaker_tgt}{speaker_src}"
    patterns (graph_utils.py:133-138). n_speakers ≤ 2, as asserted there.
    """
    if n_speakers == 1:
        return adj[:, None, :, :]
    q = qmask.astype(jnp.int32)
    rel = q[:, :, None] * n_speakers + q[:, None, :]  # rel[b, j, i]
    rels = jnp.arange(n_speakers * n_speakers)
    return adj[:, None, :, :] & (rel[:, None, :, :] == rels[None, :, None, None])


# ---------------------------------------------------------------------------
# Dense graph convolutions (replace torch_geometric RGCNConv / GraphConv)
# ---------------------------------------------------------------------------

class DenseRGCNConv(nn.Module):
    """Relational GCN over dense per-relation adjacency masks.

    out[j] = x[j] @ W_root + Σ_r mean_{i ∈ N_r(j)} x[i] @ W_r + bias
    — torch_geometric RGCNConv's documented update (root weight, bias,
    default mean aggregation), evaluated as R batched matmuls.
    """

    features: int
    num_relations: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj_rel: jnp.ndarray) -> jnp.ndarray:
        F_in = x.shape[-1]
        w_rel = self.param(
            "w_rel", nn.initializers.lecun_normal(),
            (self.num_relations, F_in, self.features))
        w_root = self.param(
            "w_root", nn.initializers.lecun_normal(), (F_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        a = adj_rel.astype(x.dtype)  # [B, R, T, T]
        deg = jnp.clip(a.sum(axis=-1, keepdims=True), 1.0, None)
        # mean-aggregate neighbours per relation, then project: the [T, T] @
        # [T, F] contraction is a single MXU matmul per (batch, relation).
        agg = jnp.einsum("brji,bif->brjf", a / deg, x)
        out = jnp.einsum("brjf,rfh->bjh", agg, w_rel)
        return out + x @ w_root + bias


class DenseGraphConv(nn.Module):
    """GraphConv (sum aggregation) over a dense adjacency mask.

    out[j] = (Σ_{i ∈ N(j)} x[i]) @ W_rel + b + x[j] @ W_root
    — torch_geometric GraphConv's update with default aggr='add'.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        agg = jnp.einsum("bji,bif->bjf", adj.astype(x.dtype), x)
        rel = nn.Dense(self.features, name="lin_rel")(agg)
        root = nn.Dense(self.features, use_bias=False, name="lin_root")(x)
        return rel + root


# ---------------------------------------------------------------------------
# Matching attention (reference matching_attention.py:18-141), vectorized
# over all candidate timesteps at once.
# ---------------------------------------------------------------------------

class MatchingAttention(nn.Module):
    """att_type ∈ {dot, general, general2, concat}. Inputs are batch-major:
    memory [B, S, D_mem], candidates [B, T, D_cand], mask [B, S]. Returns
    (attended [B, T, D_mem], alpha [B, T, S])."""

    mem_dim: int
    cand_dim: int
    alpha_dim: Optional[int] = None
    att_type: str = "general"

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,
        candidate: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.att_type == "concat" and self.alpha_dim is None:
            raise ValueError("alpha_dim must be provided for concat attention")
        if self.att_type == "dot" and self.mem_dim != self.cand_dim:
            raise ValueError("mem_dim must equal cand_dim for dot attention")
        squeeze = candidate.ndim == 2
        if squeeze:  # single candidate [B, D] (reference's calling shape)
            candidate = candidate[:, None, :]
        B, S = memory.shape[0], memory.shape[1]
        if mask is None:
            mask = jnp.ones((B, S), memory.dtype)
        mask = mask.astype(memory.dtype)

        if self.att_type == "dot":
            alpha = nn.softmax(
                jnp.einsum("btd,bsd->bts", candidate, memory), axis=-1)
        elif self.att_type == "general":
            x = nn.Dense(self.mem_dim, use_bias=False, name="transform")(candidate)
            alpha = nn.softmax(jnp.einsum("btd,bsd->bts", x, memory), axis=-1)
        elif self.att_type == "general2":
            x = nn.Dense(self.mem_dim, use_bias=True, name="transform")(candidate)
            m = memory * mask[:, :, None]
            scores = jnp.einsum("btd,bsd->bts", x, m) * mask[:, None, :]
            alpha = nn.softmax(jnp.tanh(scores), axis=-1)
            alpha = alpha * mask[:, None, :]
            alpha = alpha / jnp.clip(alpha.sum(-1, keepdims=True), 1e-12, None)
        elif self.att_type == "concat":
            m = jnp.broadcast_to(
                memory[:, None, :, :],
                (B, candidate.shape[1], S, self.mem_dim))
            c = jnp.broadcast_to(
                candidate[:, :, None, :],
                (B, candidate.shape[1], S, self.cand_dim))
            mx = jnp.tanh(
                nn.Dense(self.alpha_dim, use_bias=False, name="transform")(
                    jnp.concatenate([m, c], axis=-1)))
            scores = nn.Dense(1, use_bias=False, name="vector_prod")(mx)[..., 0]
            alpha = nn.softmax(scores, axis=-1)
        else:
            raise ValueError(f"unknown att_type {self.att_type!r}")

        attended = jnp.einsum("bts,bsd->btd", alpha, memory)
        if squeeze:
            return attended[:, 0, :], alpha
        return attended, alpha


# ---------------------------------------------------------------------------
# Stacked bidirectional recurrent helper (torch nn.LSTM/GRU num_layers=2,
# bidirectional=True, dropout between layers).
# ---------------------------------------------------------------------------

class _BiRNNStack(nn.Module):
    hidden_size: int
    num_layers: int = 2
    cell: str = "lstm"  # or "gru"
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False,
        lengths: "jnp.ndarray | None" = None,
    ) -> jnp.ndarray:
        out = x
        for layer in range(self.num_layers):
            if layer > 0 and self.dropout > 0:
                out = nn.Dropout(self.dropout, deterministic=not train)(out)

            def make_cell():
                if self.cell == "gru":
                    return nn.GRUCell(self.hidden_size)
                return nn.OptimizedLSTMCell(self.hidden_size)

            fwd = nn.RNN(make_cell(), name=f"l{layer}_fwd")
            # seq_lengths makes reverse=True flip within each sequence's
            # valid prefix (packed semantics): without it the backward scan
            # starts on global zero-pad rows and the biases drift the state
            # before it reaches real timesteps — outputs would then depend
            # on how far the dataset pad length exceeds the true length,
            # unlike the reference (pads only to the batch max).
            bwd = nn.RNN(
                make_cell(), reverse=True, keep_order=True, name=f"l{layer}_bwd")
            if lengths is not None:
                out = jnp.concatenate(
                    [fwd(out, seq_lengths=lengths),
                     bwd(out, seq_lengths=lengths)], axis=-1)
            else:
                out = jnp.concatenate([fwd(out), bwd(out)], axis=-1)
        return out


# ---------------------------------------------------------------------------
# GraphNetwork / GraphModel (reference gcnet.py:14-112, 115-232)
# ---------------------------------------------------------------------------

class GraphNetwork(nn.Module):
    """RGCN + GraphConv over one relation family, then a 2-layer bi-LSTM
    fusion and (optionally) temporal matching attention.

    Dense inputs: x [B, T, F]; adj_rel [B, R, T, T]; adj [B, T, T] (the
    relation-union window mask); valid [B, T] node-validity; umask [B, T]
    attention mask. Output [B, T, F + hidden_size] (= reference D_h).
    """

    num_features: int
    num_relations: int
    time_attention: bool
    hidden_size: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        adj_rel: jnp.ndarray,
        adj: jnp.ndarray,
        valid: jnp.ndarray,
        umask: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        out = DenseRGCNConv(
            self.hidden_size, self.num_relations, name="conv1")(x, adj_rel)
        out = DenseGraphConv(self.hidden_size, name="conv2")(out, adj)
        cat = jnp.concatenate([x, out], axis=-1)  # [B, T, D_h]
        # parity with the reference's zero-padding after
        # utterance_to_conversation (graph_utils.py:151-175): padded node
        # rows are exact zeros before the fusion LSTM.
        cat = cat * valid[..., None].astype(cat.dtype)

        d_h = self.num_features + self.hidden_size
        seq = _BiRNNStack(
            hidden_size=d_h, num_layers=2, cell="lstm",
            dropout=self.dropout, name="grufusion")(
            cat, train=train,
            lengths=valid.astype(jnp.int32).sum(axis=1))

        if self.time_attention:
            att, _ = MatchingAttention(
                2 * d_h, 2 * d_h, att_type="general2", name="matchatt")(
                seq, seq, mask=umask)
            return nn.relu(nn.Dense(d_h, name="linear")(att))
        return nn.relu(nn.Dense(d_h, name="linear")(seq))


class GraphModel(nn.Module):
    """Complete GCNet conversation model (reference gcnet.py:115-232):
    sequential context encoder (2-layer bi-LSTM/GRU) → temporal-relation
    and speaker-relation graph networks (summed) → classification +
    reconstruction heads.

    __call__(features [B, T, adim+tdim+vdim], qmask [B, T] speaker ids,
    umask [B, T], lengths [B]) → (logits [B, T, n_classes],
    rec [B, T, adim+tdim+vdim], hidden [B, T, D_h]).
    """

    base_model: str  # "LSTM" | "GRU"
    adim: int
    tdim: int
    vdim: int
    D_e: int
    graph_hidden_size: int
    n_speakers: int
    window_past: int
    window_future: int
    n_classes: int
    dropout: float = 0.5
    time_attn: bool = True

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        qmask: jnp.ndarray,
        umask: jnp.ndarray,
        lengths: jnp.ndarray,
        train: bool = False,
    ):
        if self.n_speakers > 2:
            raise ValueError("n_speakers must be <= 2 (reference constraint)")
        assert self.base_model in ("LSTM", "GRU")
        T = features.shape[1]

        seq = _BiRNNStack(
            hidden_size=self.D_e, num_layers=2,
            cell="lstm" if self.base_model == "LSTM" else "gru",
            dropout=self.dropout, name="base_rnn")(
            features, train=train, lengths=lengths.astype(jnp.int32))

        lengths = lengths.astype(jnp.int32)
        valid = jnp.arange(T)[None, :] < lengths[:, None]
        adj = window_adjacency(T, lengths, self.window_past, self.window_future)
        adj_t = temporal_relation_adjacency(adj)
        adj_s = speaker_relation_adjacency(adj, qmask, self.n_speakers)

        hidden1 = GraphNetwork(
            num_features=2 * self.D_e, num_relations=3,
            time_attention=self.time_attn, hidden_size=self.graph_hidden_size,
            dropout=self.dropout, name="graph_net_temporal")(
            seq, adj_t, adj, valid, umask, train=train)
        hidden2 = GraphNetwork(
            num_features=2 * self.D_e,
            num_relations=self.n_speakers * self.n_speakers,
            time_attention=self.time_attn, hidden_size=self.graph_hidden_size,
            dropout=self.dropout, name="graph_net_speaker")(
            seq, adj_s, adj, valid, umask, train=train)
        hidden = hidden1 + hidden2

        logits = nn.Dense(self.n_classes, name="smax_fc")(hidden)
        rec = nn.Dense(self.adim + self.tdim + self.vdim, name="linear_rec")(hidden)
        return logits, rec, hidden
