"""lstm_sequence op tests (CPU exercises the XLA fallback; the Pallas path
was validated bit-exact on TPU — see mmtpu/ops/lstm.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.ops.lstm import _xla_lstm, lstm_sequence


def setup(B=6, T=10, H=16, I=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    wi = jnp.asarray(rng.normal(size=(I, 4 * H)) * 0.1, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.float32)
    xw = (x.reshape(B * T, I) @ wi + b).reshape(B, T, 4 * H)
    return xw, wh, jnp.zeros((B, H)), jnp.zeros((B, H))


def test_pallas_vmem_admission():
    """The Pallas dispatch must refuse shapes whose blocks overflow VMEM
    (reproduced compile-time OOM at B=1024, T=50, H=32 — a realistic fused
    eval batch) while keeping every measured-win shape admitted."""
    from mmtpu.ops.lstm import _pallas_fits

    # measured-win shapes (module header table) stay admitted
    assert _pallas_fits(128, 50, 32)
    assert _pallas_fits(32, 200, 32)
    assert _pallas_fits(32, 400, 64)
    # the reproduced OOM shape and a degenerate long-T one are refused
    assert not _pallas_fits(1024, 50, 32)
    assert not _pallas_fits(32, 4000, 32)


def test_matches_flax_rnn_semantics():
    """Our gate order/activations must match flax's LSTMCell scan."""
    import flax.linen as nn

    B, T, H, I = 4, 8, 12, 6
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)

    cell = nn.OptimizedLSTMCell(H)
    rnn = nn.RNN(cell, return_carry=True)
    v = rnn.init(jax.random.PRNGKey(0), x)
    (c_f, h_f), outs_f = rnn.apply(v, x)

    p = v["params"]["cell"]
    wi = jnp.concatenate(
        [p["ii"]["kernel"], p["if"]["kernel"], p["ig"]["kernel"], p["io"]["kernel"]],
        axis=1,
    )
    wh = jnp.concatenate(
        [p["hi"]["kernel"], p["hf"]["kernel"], p["hg"]["kernel"], p["ho"]["kernel"]],
        axis=1,
    )
    b = jnp.concatenate(
        [p["hi"]["bias"], p["hf"]["bias"], p["hg"]["bias"], p["ho"]["bias"]]
    )
    xw = (x.reshape(B * T, I) @ wi + b).reshape(B, T, 4 * H)
    outs, (h, c) = lstm_sequence(xw, wh, jnp.zeros((B, H)), jnp.zeros((B, H)))
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_f), rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_f), rtol=2e-5, atol=2e-6)


def test_length_masking_freezes_state():
    xw, wh, h0, c0 = setup()
    lengths = jnp.array([10, 3, 10, 1, 7, 10], jnp.int32)
    outs, (h, c) = lstm_sequence(xw, wh, h0, c0, lengths)
    # after a sample's length, outputs repeat the frozen state
    np.testing.assert_array_equal(np.asarray(outs[1, 3:]),
                                  np.tile(np.asarray(outs[1, 2]), (7, 1)))
    np.testing.assert_array_equal(np.asarray(h[1]), np.asarray(outs[1, 2]))


def test_gradients_flow():
    xw, wh, h0, c0 = setup()
    g = jax.grad(lambda xw, wh: jnp.sum(lstm_sequence(xw, wh, h0, c0)[0] ** 2),
                 argnums=(0, 1))(xw, wh)
    assert all(bool(jnp.any(x != 0)) for x in g)


class TestStacked:
    """lstm_sequence_stacked: G recurrences in one scan must equal G
    separate lstm_sequence calls (values AND gradients)."""

    def _setup(self, G=3, B=5, T=9, H=12, seed=7):
        from mmtpu.ops.lstm import lstm_sequence_stacked

        rng = np.random.default_rng(seed)
        xw = jnp.asarray(rng.normal(size=(G, B, T, 4 * H)) * 0.3, jnp.float32)
        wh = jnp.asarray(rng.normal(size=(G, H, 4 * H)) * 0.1, jnp.float32)
        z = jnp.zeros((G, B, H))
        return lstm_sequence_stacked, xw, wh, z

    def test_matches_per_group(self):
        stacked, xw, wh, z = self._setup()
        outs, (h, c) = stacked(xw, wh, z, z)
        for g in range(xw.shape[0]):
            o_g, (h_g, c_g) = lstm_sequence(xw[g], wh[g], z[g], z[g])
            np.testing.assert_allclose(np.asarray(outs[g]), np.asarray(o_g),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(h[g]), np.asarray(h_g),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(c[g]), np.asarray(c_g),
                                       rtol=1e-6, atol=1e-7)

    def test_lengths_match_per_group(self):
        stacked, xw, wh, z = self._setup()
        G, B, T = xw.shape[:3]
        lengths = jnp.asarray(
            np.random.default_rng(1).integers(1, T + 1, (G, B)), jnp.int32
        )
        outs, (h, _) = stacked(xw, wh, z, z, lengths)
        for g in range(G):
            o_g, (h_g, _) = lstm_sequence(xw[g], wh[g], z[g], z[g], lengths[g])
            np.testing.assert_allclose(np.asarray(outs[g]), np.asarray(o_g),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(h[g]), np.asarray(h_g),
                                       rtol=1e-6, atol=1e-7)

    def test_gradients_match_per_group(self):
        stacked, xw, wh, z = self._setup(G=2)

        def loss_stacked(xw, wh):
            outs, (h, _) = stacked(xw, wh, z, z)
            return jnp.sum(outs ** 2) + jnp.sum(h ** 2)

        def loss_seq(xw, wh):
            tot = 0.0
            for g in range(xw.shape[0]):
                outs, (h, _) = lstm_sequence(xw[g], wh[g], z[g], z[g])
                tot = tot + jnp.sum(outs ** 2) + jnp.sum(h ** 2)
            return tot

        g_s = jax.grad(loss_stacked, argnums=(0, 1))(xw, wh)
        g_q = jax.grad(loss_seq, argnums=(0, 1))(xw, wh)
        for a, b in zip(g_s, g_q):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
