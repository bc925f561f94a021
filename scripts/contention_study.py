"""Round-5 contention-index study on the real tunnel chip.

BENCH_r04 proved the bracketing canary is blind to deliberate self-load:
three calibration windows dropped the train rate 62.9k -> 54.3k while their
bracketing canaries sat at 34.6/34.9/34.6 — indistinguishable from natural
windows (26.6-38.1). So the affine fit rate ~ a + b*canary is unidentifiable
by construction: self-load moves the rate but not the index.

This study validates a calibration that needs no canary-under-load at all —
the DISPLACEMENT estimator. TPU programs execute exclusively (time-slicing
is at program granularity), so a program's *device* time is
contention-independent. During a calibration window:

    steps_displaced * T_step_dev = N_selfload * T_mm_dev

where steps_displaced = R_nat * W_cal / B - N_steps (the steps the window
"lost" to self-load, using the adjacent natural rate R_nat), N_selfload is
the COUNT of self-load matmuls that completed inside the window, and
T_mm_dev = 2n^3 / QUIET_TFLOPS is the known device time of one canary-sized
matmul. Solving gives T_step_dev and hence the quiet-chip rate
R0 = B / T_step_dev directly — identified by our OWN measured displacement,
not by an index that co-tenant noise drowns.

Validation criteria printed at the end:
  1. the canary-blindness reproduction (canary under self-load vs natural);
  2. T_step_dev estimates agree across self-load duty cycles (the estimator
     is duty-invariant if the physics is right);
  3. implied quiet MFU lands in a physical range (<= 1.0, plausibly 0.5-1).

Usage: timeout 900 python scripts/contention_study.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

N_MM = 8192  # same matmul as the quiet canary constant (185 TFLOP/s)
T_MM_DEV = 2 * N_MM**3 / (bench.QUIET_CANARY_TFLOPS * 1e12)  # ~5.94 ms
B = bench.DEFAULT_BATCH


class RecordingSelfLoad:
    """Self-load thread that records each matmul's completion timestamp and
    wall duration, so the study can count completions inside a window."""

    def __init__(self, duty: float):
        self.duty = duty
        self.events = []  # (t_start, t_end) per completed matmul
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import jax

        bench.canary_tflops(reps=1, n=N_MM)  # ensure compiled + resident
        a, f = bench._CANARY_STATE[N_MM]
        while not self._stop.is_set():
            t0 = time.perf_counter()
            jax.block_until_ready(f(a))
            t1 = time.perf_counter()
            self.events.append((t0, t1))
            if self.duty < 1.0:
                self._stop.wait((t1 - t0) * (1.0 - self.duty) / self.duty)

    def completed_in(self, t0: float, t1: float) -> int:
        # a matmul's device execution lies somewhere inside (t_start, t_end);
        # count those whose wall interval is fully inside the window, plus
        # half-credit for boundary stragglers
        full = sum(1 for s, e in self.events if s >= t0 and e <= t1)
        part = sum(1 for s, e in self.events
                   if (s < t0 < e) or (s < t1 < e))
        return full + 0.5 * part

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=120)
        self.leaked = self._thread.is_alive()


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

    def barrier(st):
        s = float(jnp.sum(jax.tree_util.tree_leaves(st.params)[0]))
        jax.block_until_ready(st)
        return s

    st = [state]

    def run_window(n_steps, tag):
        t0 = time.perf_counter()
        for k in range(n_steps):
            st[0], _ = step(st[0], batch, jax.random.fold_in(rng, hash(tag) % 9999 * 1000 + k))
        barrier(st[0])
        t1 = time.perf_counter()
        return t0, t1, n_steps * B / (t1 - t0)

    # warmup
    for k in range(10):
        st[0], _ = step(st[0], batch, jax.random.fold_in(rng, k))
    barrier(st[0])

    out = {"flops": flops, "B": B, "t_mm_dev_ms": T_MM_DEV * 1e3}

    # --- natural windows + bracketing canaries -------------------------
    nat_rates, nat_canaries = [], []
    c_prev = bench.canary_tflops(reps=1)
    for w in range(3):
        _, _, r = run_window(60, f"nat{w}")
        c_next = bench.canary_tflops(reps=1)
        nat_rates.append(r)
        nat_canaries.append(0.5 * (c_prev + c_next))
        c_prev = c_next
    out["natural_rates"] = [round(r, 1) for r in nat_rates]
    out["natural_canaries"] = [round(c, 1) for c in nat_canaries]
    r_nat = statistics.median(nat_rates)

    # --- canary blindness reproduction: canary DURING self-load --------
    with RecordingSelfLoad(1.0) as sl:
        time.sleep(1.0)
        blind = [bench.canary_tflops(reps=1) for _ in range(4)]
    out["canary_during_selfload"] = [round(c, 1) for c in blind]
    out["selfload_standalone_rate_tflops"] = round(
        statistics.median(
            [2 * N_MM**3 / (e - s) / 1e12 for s, e in sl.events]
        ), 1) if sl.events else None
    out["selfload_standalone_iters"] = len(sl.events)

    # --- displacement calibration at three duties ----------------------
    cals = []
    for duty in (0.3, 0.6, 1.0):
        # re-measure the natural rate right before, for adjacency
        _, _, r_adj = run_window(40, f"adj{duty}")
        with RecordingSelfLoad(duty) as sl:
            time.sleep(0.3)  # let the loader reach steady state
            t0, t1, r_cal = run_window(60, f"cal{duty}")
        n_mm = sl.completed_in(t0, t1)
        w_cal = t1 - t0
        steps_would = r_adj * w_cal / B
        displaced = steps_would - 60
        t_step_dev = (n_mm * T_MM_DEV / displaced) if displaced > 0.5 else None
        mm_rates = [2 * N_MM**3 / (e - s) / 1e12 for s, e in sl.events
                    if s >= t0 and e <= t1]
        cals.append({
            "duty": duty,
            "rate_natural_adjacent": round(r_adj, 1),
            "rate_under_selfload": round(r_cal, 1),
            "window_s": round(w_cal, 3),
            "selfload_completed_in_window": n_mm,
            "selfload_wall_tflops_median": (
                round(statistics.median(mm_rates), 1) if mm_rates else None
            ),
            "steps_displaced": round(displaced, 2),
            "t_step_dev_ms": round(t_step_dev * 1e3, 3) if t_step_dev else None,
            "implied_quiet_rate": (
                round(B / t_step_dev, 1) if t_step_dev else None
            ),
            "implied_quiet_mfu": (
                round(flops * (B / t_step_dev) / B / bench.V5E_PEAK_FLOPS, 4)
                if t_step_dev and flops else None
            ),
            "leaked": sl.leaked,
        })
    out["calibrations"] = cals
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
