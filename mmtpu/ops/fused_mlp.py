"""Pallas fused MLP: (x @ W1 + b1).relu() @ W2 + b2 ... in ONE kernel.

The AVMNIST fusion head (Dense 192→128 → ReLU → Dense 128→64 → ReLU →
Dense 64→10, models/avmnist.py:219-230) and the FcClassifier stacks are
chains of small GEMMs; issuing them as separate XLA ops costs one HBM
round-trip per layer. This kernel keeps the activations in VMEM across all
layers: each grid step loads one batch tile, runs every GEMM back-to-back on
the MXU (fp32 accumulation via preferred_element_type), and writes only the
final logits.

Backward uses a custom VJP whose residuals are recomputed in XLA (the
layers are tiny; rematerialization is cheaper than storing activations).

Weights are zero-padded to lane multiples (128) at trace time — padding is
compile-time constant so XLA folds it; zero columns/rows contribute nothing.
Falls back to plain XLA ops on non-TPU backends.

Measured (v5e, scripts/bench_kernels.py, AVMNIST head 192→128→64→10,
ms/call): forward B=1024 pallas 0.776 vs XLA 1.212 (−36%), B=128 1.003 vs
1.119; forward+backward loses (the recompute VJP pays the layers twice), so
the production wiring (models/avmnist.py fusion head) uses the kernel on
the EVAL path only — which is also where the workload multiplies (the
missing-pattern evaluation visits samples × patterns).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmtpu.ops.tiling import LANE, SUBLANE, round_up as _round_up


def _xla_mlp(x, weights, biases):
    h = x
    for i, (w, b) in enumerate(zip(weights, biases)):
        h = h @ w + b
        if i < len(weights) - 1:
            h = jax.nn.relu(h)
    return h


def _pallas_fits(B: int, dims) -> bool:
    """Conservative VMEM admission (mirrors ops/lstm.py:_pallas_fits).

    Every weight block is full-resident per grid step (in_specs index
    lambda i: (0,0)) alongside the batch tile, the widest activation, and
    the output tile. The measured-good AVMNIST head is ~0.4 MB; admit up
    to a 40 MB f32 footprint and let everything bigger (e.g. 2048x4096
    FcClassifier stacks, 32 MB for ONE weight) take the XLA fallback
    instead of failing the whole program at compile with a VMEM OOM."""
    pdims = [_round_up(d, LANE) for d in dims]
    BT = min(_round_up(B, SUBLANE), 512)
    weight_bytes = sum(
        pdims[i] * pdims[i + 1] + pdims[i + 1] for i in range(len(dims) - 1)
    )
    act_bytes = BT * (pdims[0] + max(pdims) + pdims[-1])
    return 4 * (weight_bytes + act_bytes) <= 40 * 2**20


def _pallas_forward(x, weights, biases):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D0 = x.shape
    dims = [D0] + [w.shape[1] for w in weights]
    pdims = [_round_up(d, LANE) for d in dims]
    BT = min(_round_up(B, SUBLANE), 512)

    xp = jnp.pad(x, ((0, _round_up(B, BT) - B), (0, pdims[0] - D0)))
    wps = [
        jnp.pad(w, ((0, pdims[i] - w.shape[0]), (0, pdims[i + 1] - w.shape[1])))
        for i, w in enumerate(weights)
    ]
    bps = [
        jnp.pad(b, (0, pdims[i + 1] - b.shape[0])).reshape(1, -1)
        for i, b in enumerate(biases)
    ]

    n_layers = len(weights)

    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers : 2 * n_layers]
        out_ref = refs[2 * n_layers]
        h = x_ref[:]
        for i in range(n_layers):
            h = (
                jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
                + b_refs[i][:]
            )
            if i < n_layers - 1:
                h = jnp.maximum(h, 0.0)
        out_ref[:] = h

    grid = (xp.shape[0] // BT,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], pdims[-1]), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((BT, pdims[0]), lambda i: (i, 0)),
            ]
            + [
                pl.BlockSpec((pdims[j], pdims[j + 1]), lambda i: (0, 0))
                for j in range(n_layers)
            ]
            + [
                pl.BlockSpec((1, pdims[j + 1]), lambda i: (0, 0))
                for j in range(n_layers)
            ],
            out_specs=pl.BlockSpec((BT, pdims[-1]), lambda i: (i, 0)),
        ),
    )(xp, *wps, *bps)
    # the XLA fallback preserves the input dtype; match it so the output
    # dtype is not backend-dependent (kernel accumulates fp32 either way)
    return out[:B, : dims[-1]].astype(x.dtype)


@jax.custom_vjp
def fused_mlp(x, weights: Tuple, biases: Tuple):
    """ReLU-MLP chain; weights/biases are tuples of (in,out)/(out,) arrays."""
    import mmtpu.ops as _ops

    # xla_forced: serving export traces through the XLA fallback so
    # multi-platform / symbolic-batch artifacts never embed Pallas — the
    # gate lives HERE (mirroring ops/lstm.py) so every caller is covered
    if _ops.xla_forced() or jax.default_backend() != "tpu":
        return _xla_mlp(x, weights, biases)
    dims = [x.shape[1]] + [w.shape[1] for w in weights]
    if not _pallas_fits(x.shape[0], dims):
        return _xla_mlp(x, weights, biases)
    return _pallas_forward(x, weights, biases)


def _fwd(x, weights, biases):
    out = fused_mlp(x, weights, biases)
    return out, (x, weights, biases)


def _bwd(res, g):
    x, weights, biases = res
    # recompute activations in XLA (cheap; layers are small)
    acts = [x]
    h = x
    for i, (w, b) in enumerate(zip(weights, biases)):
        h = h @ w + b
        if i < len(weights) - 1:
            h = jax.nn.relu(h)
        acts.append(h)
    dx = g
    dws, dbs = [None] * len(weights), [None] * len(weights)
    for i in reversed(range(len(weights))):
        # through ReLU (not after the last layer)
        if i < len(weights) - 1:
            dx = dx * (acts[i + 1] > 0)
        dws[i] = acts[i].T @ dx
        dbs[i] = jnp.sum(dx, axis=0)
        dx = dx @ weights[i].T
    return dx, tuple(dws), tuple(dbs)


fused_mlp.defvjp(_fwd, _bwd)
