"""Round-5 contention study, part 2: INTERLEAVED displacement estimator.

Part 1 (contention_study.py) showed the threaded self-load displaces almost
nothing: PJRT execution within one client is FIFO, so a loader thread's
matmul queues behind the entire dispatched train-step stream and completes
~5/s — a 1-3% displacement, below window noise. And the bracketing canary
is confirmed blind (34-38 under full self-load vs 37-39 natural).

New design — no threads: the MAIN thread enqueues m canary-sized matmuls
interleaved with the window's train steps (all async, FIFO device order).
TPU programs run to completion once scheduled, so each matmul consumes a
known device time T_mm = 2n^3 / QUIET_TFLOPS regardless of co-tenant load.
For a tight pair of windows (same co-tenant share sigma):

    W_plain = S * T_step / (1 - sigma)
    W_mixed = (S * T_step + m * T_mm) / (1 - sigma)
 => (1 - sigma) = m * T_mm / (W_mixed - W_plain)          [share, direct]
 => T_step      = W_plain * (1 - sigma) / S
 => R_quiet     = B / T_step                              [quiet-chip rate]

Validation: estimates must agree across m (60 vs 120), and implied quiet
MFU must be physical (<= 1.0). ABAB pairing bounds sigma drift.

Usage: timeout 900 python scripts/contention_study2.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

N_MM = 8192
T_MM_DEV = 2 * N_MM**3 / (bench.QUIET_CANARY_TFLOPS * 1e12)  # ~5.94 ms
B = bench.DEFAULT_BATCH
S = 60  # train steps per window


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    state, step, batch, rng = bench.build(B)

    flops = None
    try:
        compiled = step.lower(state, batch, rng).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    bench.canary_tflops(reps=1, n=N_MM)  # compile + device-put the canary
    a_mm, f_mm = bench._CANARY_STATE[N_MM]

    def barrier(st, extras=()):
        s = float(jnp.sum(jax.tree_util.tree_leaves(st.params)[0]))
        for x in extras:
            jax.block_until_ready(x)
        jax.block_until_ready(st)
        return s

    st = [state]

    def window(m: int, tag: int):
        """S train steps with m canary matmuls interleaved evenly."""
        outs = []
        every = S / m if m else None
        t0 = time.perf_counter()
        nxt = every if m else float("inf")
        for k in range(S):
            st[0], _ = step(st[0], batch, jax.random.fold_in(rng, tag * 1000 + k))
            while k + 1 >= nxt:
                outs.append(f_mm(a_mm))
                nxt += every
        barrier(st[0], outs)
        return time.perf_counter() - t0

    # warmup
    for k in range(10):
        st[0], _ = step(st[0], batch, jax.random.fold_in(rng, k))
    barrier(st[0])
    window(4, 999)  # warm the mixed path too

    out = {"flops": flops, "B": B, "S": S, "t_mm_dev_ms": T_MM_DEV * 1e3}
    results = []
    # ABAB pairing: plain, mixed(m), plain, mixed(m) ... per m
    for m in (30, 60, 120):
        pairs = []
        for rep in range(3):
            c0 = bench.canary_tflops(reps=1)
            w_plain = window(0, 10 * m + rep * 2)
            w_mixed = window(m, 10 * m + rep * 2 + 1)
            c1 = bench.canary_tflops(reps=1)
            share = m * T_MM_DEV / (w_mixed - w_plain) if w_mixed > w_plain else None
            t_step = w_plain * share / S if share else None
            pairs.append({
                "w_plain_s": round(w_plain, 3),
                "w_mixed_s": round(w_mixed, 3),
                "rate_plain": round(S * B / w_plain, 1),
                "bracket_canary": round(0.5 * (c0 + c1), 1),
                "share": round(share, 4) if share else None,
                "implied_quiet_rate": round(B / t_step, 1) if t_step else None,
                "implied_quiet_mfu": (
                    round(flops / t_step / bench.V5E_PEAK_FLOPS, 4)
                    if t_step and flops else None
                ),
            })
        shares = [p["share"] for p in pairs if p["share"]]
        results.append({
            "m": m,
            "pairs": pairs,
            "share_median": round(statistics.median(shares), 4) if shares else None,
        })
    out["interleaved"] = results
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
