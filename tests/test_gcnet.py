"""GCNet family: dense masked-adjacency formulation vs an independent
edge-list reimplementation of the reference semantics
(models/msa/networks/graph_utils.py:9-148, matching_attention.py:113-131,
torch_geometric RGCNConv/GraphConv documented math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmtpu.models.gcnet import (
    DenseGraphConv,
    DenseRGCNConv,
    GraphModel,
    MatchingAttention,
    speaker_relation_adjacency,
    temporal_relation_adjacency,
    window_adjacency,
)
from mmtpu.train.gcnet_loss import (
    masked_ce_loss,
    masked_mse_loss,
    masked_recon_loss,
)

RNG = np.random.default_rng(0)


# -- host-side reimplementation of reference edge_perms ---------------------

def ref_edge_perms(L, wp, wf):
    edges = set()
    for i in range(L):
        if wp == -1 and wf == -1:
            rng = range(L)
        elif wp == -1:
            rng = range(0, min(L, i + wf + 1))
        elif wf == -1:
            rng = range(max(0, i - wp), L)
        else:
            rng = range(max(0, i - wp), min(L, i + wf + 1))
        edges.update((i, j) for j in rng)
    return sorted(edges)


@pytest.mark.parametrize("wp,wf", [(1, 1), (2, 0), (-1, 1), (1, -1), (-1, -1)])
def test_window_adjacency_matches_edge_perms(wp, wf):
    T, lengths = 6, np.array([6, 4, 1])
    adj = np.asarray(window_adjacency(T, jnp.asarray(lengths), wp, wf))
    for b, L in enumerate(lengths):
        edges = set(ref_edge_perms(L, wp, wf))
        for i in range(T):
            for j in range(T):
                # A[b, j, i] == edge (src=i, tgt=j) present
                assert adj[b, j, i] == ((i, j) in edges), (b, i, j)


def test_temporal_and_speaker_relations_partition_adjacency():
    T = 5
    lengths = jnp.asarray([5, 3])
    qmask = jnp.asarray(RNG.integers(0, 2, (2, T)))
    adj = window_adjacency(T, lengths, 2, 2)
    adj_t = temporal_relation_adjacency(adj)
    adj_s = speaker_relation_adjacency(adj, qmask, 2)
    # each edge belongs to exactly one temporal and one speaker relation
    assert np.array_equal(np.asarray(adj_t.sum(1)), np.asarray(adj, int))
    assert np.array_equal(np.asarray(adj_s.sum(1)), np.asarray(adj, int))
    # temporal index order past/now/future: "past" edges have tgt > src
    past = np.asarray(adj_t)[0, 0]
    assert past[3, 1] and not past[1, 3]
    # speaker relation id = q[tgt]*2 + q[src]
    q = np.asarray(qmask)[0]
    r = int(q[2]) * 2 + int(q[1])
    assert np.asarray(adj_s)[0, r, 2, 1]


def ref_rgcn(x, edges, etypes, w_rel, w_root, bias):
    """Edge-list RGCN, mean aggregation per relation (PyG RGCNConv)."""
    N = x.shape[0]
    out = x @ w_root + bias
    R = w_rel.shape[0]
    for r in range(R):
        acc = np.zeros((N, w_rel.shape[2]))
        cnt = np.zeros(N)
        for (src, tgt), t in zip(edges, etypes):
            if t == r:
                acc[tgt] += x[src] @ w_rel[r]
                cnt[tgt] += 1
        out += acc / np.clip(cnt, 1, None)[:, None]
    return out


def test_dense_rgcn_matches_edge_list():
    T, F, H, R = 5, 4, 3, 3
    L, wp, wf = 4, 1, 1
    x = RNG.normal(size=(1, T, F))
    adj = window_adjacency(T, jnp.asarray([L]), wp, wf)
    adj_t = temporal_relation_adjacency(adj)
    mod = DenseRGCNConv(H, R)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), adj_t)
    out = np.asarray(mod.apply(v, jnp.asarray(x), adj_t))[0]

    edges = ref_edge_perms(L, wp, wf)
    etypes = [0 if j > i else (1 if j == i else 2) for i, j in edges]
    w_rel = np.asarray(v["params"]["w_rel"])
    w_root = np.asarray(v["params"]["w_root"])
    bias = np.asarray(v["params"]["bias"])
    want = ref_rgcn(x[0, :L], edges, etypes, w_rel, w_root, bias)
    np.testing.assert_allclose(out[:L], want, rtol=1e-5, atol=1e-5)


def test_dense_graphconv_matches_edge_list():
    T, F, H = 5, 4, 3
    L, wp, wf = 4, 2, 0
    x = RNG.normal(size=(1, T, F))
    adj = window_adjacency(T, jnp.asarray([L]), wp, wf)
    mod = DenseGraphConv(H)
    v = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), adj)
    out = np.asarray(mod.apply(v, jnp.asarray(x), adj))[0]

    wr = np.asarray(v["params"]["lin_rel"]["kernel"])
    br = np.asarray(v["params"]["lin_rel"]["bias"])
    w0 = np.asarray(v["params"]["lin_root"]["kernel"])
    edges = ref_edge_perms(L, wp, wf)
    want = x[0, :L] @ w0 + br
    for src, tgt in edges:
        want[tgt] += x[0, src] @ wr
    np.testing.assert_allclose(out[:L], want, rtol=1e-5, atol=1e-5)


def test_matching_attention_general2_matches_loop():
    """Vectorized general2 == the reference's per-candidate formula
    (matching_attention.py:113-131) evaluated in numpy."""
    B, S, D = 2, 5, 6
    mem = RNG.normal(size=(B, S, D))
    umask = np.ones((B, S)); umask[1, 3:] = 0
    mod = MatchingAttention(D, D, att_type="general2")
    v = mod.init(jax.random.PRNGKey(2), jnp.asarray(mem), jnp.asarray(mem),
                 jnp.asarray(umask))
    att, alpha = mod.apply(v, jnp.asarray(mem), jnp.asarray(mem),
                           jnp.asarray(umask))
    w = np.asarray(v["params"]["transform"]["kernel"])
    b = np.asarray(v["params"]["transform"]["bias"])
    for bt in range(B):
        for t in range(S):
            xr = mem[bt, t] @ w + b
            m = mem[bt] * umask[bt][:, None]
            sc = np.tanh((m @ xr) * umask[bt])
            a = np.exp(sc - sc.max()); a /= a.sum()
            a = a * umask[bt]; a /= a.sum()
            np.testing.assert_allclose(
                np.asarray(att)[bt, t], a @ mem[bt], rtol=1e-5, atol=1e-5)


def make_inputs(B=2, T=6, adim=3, tdim=4, vdim=2):
    D = adim + tdim + vdim
    feats = jnp.asarray(RNG.normal(size=(B, T, D)), jnp.float32)
    qmask = jnp.asarray(RNG.integers(0, 2, (B, T)))
    lengths = jnp.asarray([T, T - 2])
    umask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    return feats, qmask, umask, lengths


def test_graph_model_forward_and_grads():
    # jit everything (incl. init): op-by-op dispatch of the scan-heavy
    # GraphModel took ~3 min of this suite's wall; jitted programs land in
    # the persistent compilation cache and replay in milliseconds.
    feats, qmask, umask, lengths = make_inputs()
    model = GraphModel(
        base_model="LSTM", adim=3, tdim=4, vdim=2, D_e=5,
        graph_hidden_size=4, n_speakers=2, window_past=2, window_future=2,
        n_classes=4, dropout=0.0, time_attn=True)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), feats, qmask, umask,
                            lengths)
    logits, rec, hidden = jax.jit(model.apply)(v, feats, qmask, umask,
                                               lengths)
    B, T = feats.shape[:2]
    assert logits.shape == (B, T, 4)
    assert rec.shape == feats.shape
    assert hidden.shape == (B, T, 2 * 5 + 4)

    present = jnp.asarray(RNG.integers(0, 2, (B, T, 3)), jnp.float32)
    labels = jnp.asarray(RNG.integers(0, 4, (B, T)))

    def loss_fn(params):
        lg, rc, _ = model.apply({"params": params}, feats, qmask, umask,
                                lengths)
        return (masked_ce_loss(lg, labels, umask)
                + masked_recon_loss(rc, feats, present, umask, 3, 4, 2))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_valid_outputs_invariant_to_pad_length():
    """Reference parity: the reference pads conversations only to the
    batch max; here the dataset pads to a global T. Valid-position logits
    must not depend on how much padding follows — the reverse-direction
    RNNs run with seq_lengths so their scan starts at each sequence's last
    REAL step, not on pad rows."""
    feats, qmask, umask, lengths = make_inputs()
    model = GraphModel(
        base_model="LSTM", adim=3, tdim=4, vdim=2, D_e=5,
        graph_hidden_size=4, n_speakers=2, window_past=2, window_future=2,
        n_classes=4, dropout=0.0, time_attn=True)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), feats, qmask, umask,
                            lengths)
    logits, _, _ = jax.jit(model.apply)(v, feats, qmask, umask, lengths)

    pad = 5  # extend the global pad length; real data unchanged
    T = feats.shape[1]
    feats_p = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    qmask_p = jnp.pad(qmask, ((0, 0), (0, pad)))
    umask_p = jnp.pad(umask, ((0, 0), (0, pad)))
    logits_p, _, _ = jax.jit(model.apply)(v, feats_p, qmask_p, umask_p,
                                          lengths)
    for b, ln in enumerate(np.asarray(lengths)):
        np.testing.assert_allclose(
            np.asarray(logits)[b, :ln], np.asarray(logits_p)[b, :ln],
            rtol=1e-5, atol=1e-5,
        )


def test_graph_model_gru_variant_and_registry():
    from mmtpu.models import build_module

    feats, qmask, umask, lengths = make_inputs()
    model = build_module(
        "gcnet", base_model="GRU", adim=3, tdim=4, vdim=2, D_e=5,
        graph_hidden_size=4, n_speakers=1, window_past=-1, window_future=-1,
        n_classes=4, dropout=0.0, time_attn=False)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), feats, qmask, umask,
                            lengths)
    logits, rec, hidden = jax.jit(model.apply)(v, feats, qmask, umask,
                                               lengths)
    assert logits.shape == (2, 6, 4)


def test_padded_nodes_do_not_feed_graph_messages():
    """Messages never cross the valid-length boundary: perturbing padded
    node features leaves graph-conv outputs at valid nodes unchanged."""
    T, F, H = 6, 4, 3
    x = RNG.normal(size=(1, T, F))
    x2 = x.copy(); x2[0, 4:] += 100.0  # lengths=4 → positions 4,5 padded
    adj = window_adjacency(T, jnp.asarray([4]), -1, -1)
    mod = DenseRGCNConv(H, 3)
    adj_t = temporal_relation_adjacency(adj)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), adj_t)
    o1 = np.asarray(mod.apply(v, jnp.asarray(x), adj_t))[0, :4]
    o2 = np.asarray(mod.apply(v, jnp.asarray(x2), adj_t))[0, :4]
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_masked_losses():
    B, T, C = 2, 4, 3
    logits = jnp.asarray(RNG.normal(size=(B, T, C)), jnp.float32)
    labels = jnp.asarray(RNG.integers(0, C, (B, T)))
    umask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)
    ce = masked_ce_loss(logits, labels, umask)
    # hand CE over the 5 valid cells
    lp = np.asarray(jax.nn.log_softmax(np.asarray(logits), -1))
    want = 0.0
    for b in range(B):
        for t in range(T):
            if umask[b, t]:
                want -= lp[b, t, int(labels[b, t])]
    np.testing.assert_allclose(float(ce), want / 5, rtol=1e-5)

    pred = jnp.asarray(RNG.normal(size=(B, T)), jnp.float32)
    tgt = jnp.asarray(RNG.normal(size=(B, T)), jnp.float32)
    mse = masked_mse_loss(pred, tgt, umask)
    want = float(np.sum((np.asarray(pred * umask) - np.asarray(tgt * umask)) ** 2)
                 / np.asarray(umask).sum())
    np.testing.assert_allclose(float(mse), want, rtol=1e-5)

    # recon loss counts only missing modalities
    D = 3 + 4 + 2
    rec = jnp.asarray(RNG.normal(size=(B, T, D)), jnp.float32)
    target = jnp.asarray(RNG.normal(size=(B, T, D)), jnp.float32)
    all_present = jnp.ones((B, T, 3), jnp.float32)
    assert float(masked_recon_loss(
        rec, target, all_present, umask, 3, 4, 2)) == 0.0
    none_present = jnp.zeros((B, T, 3), jnp.float32)
    assert float(masked_recon_loss(
        rec, target, none_present, umask, 3, 4, 2)) > 0.0
