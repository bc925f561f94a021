"""Pallas full-sequence LSTM: the recurrent state never leaves VMEM.

XLA's scanned LSTM writes h/c to HBM every timestep; this kernel runs the
whole sequence per batch-tile with h and c in VMEM scratch. The input
projection x@Wi (the big, parallel GEMM) stays in XLA where the MXU is
already saturated; the kernel handles the serial part: per-step h@Wh + gate
elementwise chain + length masking (packed-sequence semantics).

Gate order follows flax: [i, f, g, o] (sigmoid, sigmoid, tanh, sigmoid).
Backward = custom VJP that recomputes through a pure-XLA reference scan
(jax.vjp), so gradients are exactly the reference's.

Falls back to the XLA reference on non-TPU backends.

Measured (v5e, scripts/bench_kernels.py, ms/call fwd):
    B=128 T=50  H=32   pallas 1.501 vs XLA 1.794  (-16%)
    B=128 T=50  H=64   pallas 1.163 vs XLA 1.150  (parity)
    B=128 T=50  H=128  pallas 0.811 vs XLA 0.790  (parity)
    B=32  T=200 H=32   pallas 0.734 vs XLA 1.230  (-40%)
    B=32  T=400 H=64   pallas 0.872 vs XLA 1.914  (-54%)
The serial per-step cost dominates at small H / long T, where the
VMEM-resident kernel wins big; at the shipped MOSI shapes (T=50, H>=64)
XLA's scan is at parity. `lstm_sequence` therefore dispatches BY SHAPE
(pallas when T >= 3·H or H <= 32) — the fused wi/wh parameter layout is
identical either way, so checkpoints don't depend on the dispatch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mmtpu.ops.tiling import LANE, round_up as _round_up


def _xla_lstm(xw, wh, h0, c0, lengths):
    """Reference scan: xw (B, T, 4H) already includes x@Wi + b."""
    H = wh.shape[0]

    def step(carry, t):
        h, c = carry
        pre = xw[:, t] + h @ wh
        i = jax.nn.sigmoid(pre[:, :H])
        f = jax.nn.sigmoid(pre[:, H : 2 * H])
        g = jnp.tanh(pre[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if lengths is not None:
            keep = (t < lengths)[:, None]
            h_new = jnp.where(keep, h_new, h)
            c_new = jnp.where(keep, c_new, c)
        return (h_new, c_new), h_new

    (h, c), outs = jax.lax.scan(step, (h0, c0), jnp.arange(xw.shape[1]))
    return jnp.transpose(outs, (1, 0, 2)), (h, c)


def _pallas_lstm(xw, wh, h0, c0, lengths):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, H4 = xw.shape
    H = H4 // 4
    Hp = _round_up(H, LANE)
    BT = min(_round_up(B, 8), 256)
    Bp = _round_up(B, BT)

    xw_p = jnp.pad(xw, ((0, Bp - B), (0, 0), (0, 0)))
    # pad each gate block of wh columns to Hp so in-kernel slices align
    wh_p = jnp.pad(wh, ((0, Hp - H), (0, 0)))
    wh_p = jnp.concatenate(
        [
            jnp.pad(wh_p[:, k * H : (k + 1) * H], ((0, 0), (0, Hp - H)))
            for k in range(4)
        ],
        axis=1,
    )  # (Hp, 4Hp)
    xw_p = jnp.concatenate(
        [
            jnp.pad(xw_p[:, :, k * H : (k + 1) * H], ((0, 0), (0, 0), (0, Hp - H)))
            for k in range(4)
        ],
        axis=2,
    )  # (Bp, T, 4Hp)
    h0_p = jnp.pad(h0, ((0, Bp - B), (0, Hp - H)))
    c0_p = jnp.pad(c0, ((0, Bp - B), (0, Hp - H)))
    lens = (
        jnp.pad(lengths, (0, Bp - B)) if lengths is not None
        else jnp.full((Bp,), T, jnp.int32)
    ).astype(jnp.int32)[:, None]

    def kernel(xw_ref, wh_ref, h0_ref, c0_ref, len_ref, out_ref, hT_ref, cT_ref,
               h_s, c_s):
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

        def body(t, _):
            h = h_s[:]
            pre = xw_ref[:, t, :] + jnp.dot(
                h, wh_ref[:], preferred_element_type=jnp.float32
            )
            i = jax.nn.sigmoid(pre[:, :Hp])
            f = jax.nn.sigmoid(pre[:, Hp : 2 * Hp])
            g = jnp.tanh(pre[:, 2 * Hp : 3 * Hp])
            o = jax.nn.sigmoid(pre[:, 3 * Hp :])
            c_new = f * c_s[:] + i * g
            h_new = o * jnp.tanh(c_new)
            keep = (t < len_ref[:]).reshape(-1, 1)
            h_s[:] = jnp.where(keep, h_new, h)
            c_s[:] = jnp.where(keep, c_new, c_s[:])
            out_ref[:, t, :] = h_s[:]
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        hT_ref[:] = h_s[:]
        cT_ref[:] = c_s[:]

    grid = (Bp // BT,)
    outs, hT, cT = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((BT, T, 4 * Hp), lambda i: (i, 0, 0)),
                pl.BlockSpec((Hp, 4 * Hp), lambda i: (0, 0)),
                pl.BlockSpec((BT, Hp), lambda i: (i, 0)),
                pl.BlockSpec((BT, Hp), lambda i: (i, 0)),
                pl.BlockSpec((BT, 1), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((BT, T, Hp), lambda i: (i, 0, 0)),
                pl.BlockSpec((BT, Hp), lambda i: (i, 0)),
                pl.BlockSpec((BT, Hp), lambda i: (i, 0)),
            ],
            scratch_shapes=[
                # h and c live here for the whole sequence
                pltpu.VMEM((BT, Hp), jnp.float32),
                pltpu.VMEM((BT, Hp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp, T, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ],
    )(xw_p, wh_p, h0_p, c0_p, lens)
    return outs[:B, :, :H], (hT[:B, :H], cT[:B, :H])


def lstm_sequence_stacked(
    xw: jnp.ndarray,
    wh: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """G independent LSTMs advanced by ONE scan (the multi-encoder fusion).

    xw: (G, B, T, 4H) pre-projected inputs; wh: (G, H, 4H); h0/c0: (G, B, H);
    lengths: optional (G, B). Returns (outputs (G, B, T, H), (h, c)).

    Why this exists: UttFusion-style models run one LSTM per modality.
    As separate `lax.scan`s those execute back-to-back on the TPU's single
    compute stream — 2x T sequential steps of MXU-underfilling (B, H)
    matmuls. Stacking the G recurrences into one scan whose step does a
    single batched (G, B, H) x (G, H, 4H) contraction halves the sequential
    chain (measured on the MOSI UttFusion train step: see RESULTS.md).
    Mathematically identical to G separate `lstm_sequence` calls; plain XLA
    (differentiable as-is), since the per-group pallas dispatch shapes
    (long T / tiny H) are not where multi-encoder models live."""
    G, B, T, H4 = xw.shape
    H = H4 // 4

    def step(carry, t):
        h, c = carry  # (G, B, H)
        pre = xw[:, :, t] + jnp.einsum(
            "gbh,gho->gbo", h, wh, preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(pre[..., :H])
        f = jax.nn.sigmoid(pre[..., H : 2 * H])
        g = jnp.tanh(pre[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(pre[..., 3 * H :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if lengths is not None:
            keep = (t < lengths)[..., None]
            h_new = jnp.where(keep, h_new, h)
            c_new = jnp.where(keep, c_new, c)
        return (h_new, c_new), h_new

    (h, c), outs = jax.lax.scan(step, (h0, c0), jnp.arange(T))
    return jnp.transpose(outs, (1, 2, 0, 3)), (h, c)


def _pallas_fits(B: int, T: int, H: int) -> bool:
    """Conservative VMEM admission for the kernel's (BT, T, ·) blocks.

    Known-good measured points run at grid == 1 (whole batch in one tile,
    no double buffering) with in+out blocks up to ~33 MB (B=32, T=400,
    H=64); a grid-4 dispatch (B=1024, T=50, H=32 → BT=256) OOMs VMEM at
    compile. Admit only single-tile grids under a 40 MB block budget —
    everything else takes the XLA scan (which batches large B well on the
    MXU anyway)."""
    Hp = _round_up(H, LANE)
    BT = _round_up(B, 8)
    if BT > 256:  # multi-tile grid → double-buffered blocks → VMEM OOM
        return False
    return 4 * BT * T * 5 * Hp <= 40 * 2**20  # input (4Hp) + output (Hp)


@jax.custom_vjp
def lstm_sequence(
    xw: jnp.ndarray,
    wh: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """xw: (B,T,4H) pre-projected inputs; wh: (H,4H). Returns (outputs, (h,c)).

    Shape-dispatched: the Pallas kernel runs where it measurably wins
    (small H / long T — see module header) AND fits VMEM; XLA scan
    elsewhere."""
    import mmtpu.ops as _ops

    # xla_forced: mmtpu.serving.export traces through the XLA scan so
    # multi-platform / symbolic-batch artifacts never embed Pallas
    if _ops.xla_forced() or jax.default_backend() != "tpu":
        return _xla_lstm(xw, wh, h0, c0, lengths)
    H, T = wh.shape[0], xw.shape[1]
    B = xw.shape[0]
    if (T >= 3 * H or H <= 32) and _pallas_fits(B, T, H):
        return _pallas_lstm(xw, wh, h0, c0, lengths)
    return _xla_lstm(xw, wh, h0, c0, lengths)


def _fwd(xw, wh, h0, c0, lengths):
    out = lstm_sequence(xw, wh, h0, c0, lengths)
    return out, (xw, wh, h0, c0, lengths)


def _bwd(res, g):
    xw, wh, h0, c0, lengths = res
    _, vjp = jax.vjp(lambda a, b, c, d: _xla_lstm(a, b, c, d, lengths),
                     xw, wh, h0, c0)
    dxw, dwh, dh0, dc0 = vjp(g)
    return dxw, dwh, dh0, dc0, None


lstm_sequence.defvjp(_fwd, _bwd)
