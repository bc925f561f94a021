"""Pallas op tests (CPU: XLA fallback path; the kernel itself is exercised
on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.ops import fused_mlp


def make_mlp(dims, seed=0):
    rng = np.random.default_rng(seed)
    ws = tuple(
        jnp.asarray(rng.normal(size=(dims[i], dims[i + 1])) * 0.1, jnp.float32)
        for i in range(len(dims) - 1)
    )
    bs = tuple(
        jnp.asarray(rng.normal(size=(dims[i + 1],)) * 0.1, jnp.float32)
        for i in range(len(dims) - 1)
    )
    return ws, bs


def reference(x, ws, bs):
    h = x
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = h @ w + b
        if i < len(ws) - 1:
            h = jax.nn.relu(h)
    return h


def test_forward_matches_reference():
    ws, bs = make_mlp([192, 128, 64, 10])
    x = jnp.asarray(np.random.default_rng(1).normal(size=(37, 192)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused_mlp(x, ws, bs)),
        np.asarray(reference(x, ws, bs)),
        rtol=1e-5, atol=1e-5,
    )


def test_gradients_match_reference():
    ws, bs = make_mlp([32, 16, 8])
    x = jnp.asarray(np.random.default_rng(2).normal(size=(12, 32)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(3).normal(size=(12, 8)), jnp.float32)

    def loss_fused(x, ws, bs):
        return jnp.mean((fused_mlp(x, ws, bs) - y) ** 2)

    def loss_ref(x, ws, bs):
        return jnp.mean((reference(x, ws, bs) - y) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pallas_fits_admission():
    """VMEM admission gate (mirrors ops/lstm.py): the measured-good AVMNIST
    head fits; a 2048x4096 FcClassifier-sized stack (32 MB for ONE weight
    block, all blocks resident per grid step) must take the XLA fallback
    instead of failing the program at compile with a VMEM OOM."""
    from mmtpu.ops.fused_mlp import _pallas_fits

    assert _pallas_fits(1024, [192, 128, 64, 10])   # AVMNIST fusion head
    assert _pallas_fits(128, [256, 256, 128])
    assert not _pallas_fits(128, [2048, 4096, 2048])
    assert not _pallas_fits(512, [4096, 4096])
