"""Measure the Pallas kernels against their XLA equivalents on the real TPU
at the shapes the shipped configs actually use, to decide wire-vs-delete
(VERDICT round-1 weak #2).

  python scripts/bench_kernels.py

Shapes:
- fused MLP: the AVMNIST fusion head (concat 192 -> 128 -> 64 -> 10) at the
  bench batch sizes, fwd and fwd+bwd.
- LSTM: MOSI-family shapes (B=128, T=50, H in {32, 64, 128}) and a
  small-H/long-T regime (B=32, T=200, H=32) where per-step launch overhead
  should favor the fused kernel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root: scripts run from anywhere



def timeit(fn, *args, steps=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def bench_fused_mlp():
    from mmtpu.ops.fused_mlp import _xla_mlp, fused_mlp

    print("== fused MLP (192->128->64->10)")
    rng = np.random.default_rng(0)
    dims = [192, 128, 64, 10]
    ws = tuple(
        jnp.asarray(rng.normal(size=(dims[i], dims[i + 1])) * 0.05, jnp.float32)
        for i in range(3)
    )
    bs = tuple(jnp.zeros((dims[i + 1],), jnp.float32) for i in range(3))
    for B in (128, 512, 1024):
        x = jnp.asarray(rng.normal(size=(B, dims[0])), jnp.float32)

        xla_f = jax.jit(lambda x: _xla_mlp(x, ws, bs))
        pal_f = jax.jit(lambda x: fused_mlp(x, ws, bs))
        t_x = timeit(xla_f, x)
        t_p = timeit(pal_f, x)

        def loss_xla(x):
            return jnp.sum(_xla_mlp(x, ws, bs) ** 2)

        def loss_pal(x):
            return jnp.sum(fused_mlp(x, ws, bs) ** 2)

        g_x = timeit(jax.jit(jax.grad(loss_xla)), x)
        g_p = timeit(jax.jit(jax.grad(loss_pal)), x)
        print(
            f"B={B:5d}  fwd xla {t_x:.3f} ms vs pallas {t_p:.3f} ms | "
            f"fwd+bwd xla {g_x:.3f} ms vs pallas {g_p:.3f} ms"
        )


def bench_lstm():
    from mmtpu.ops.lstm import _xla_lstm, lstm_sequence

    print("== LSTM full-sequence kernel vs XLA scan")
    rng = np.random.default_rng(0)
    for B, T, H in ((128, 50, 32), (128, 50, 64), (128, 50, 128),
                    (32, 200, 32), (32, 400, 64)):
        xw = jnp.asarray(rng.normal(size=(B, T, 4 * H)) * 0.05, jnp.float32)
        wh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.05, jnp.float32)
        h0 = jnp.zeros((B, H), jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)
        lengths = jnp.full((B,), T)

        xla_f = jax.jit(lambda xw, wh: _xla_lstm(xw, wh, h0, c0, None)[0])
        pal_f = jax.jit(lambda xw, wh: lstm_sequence(xw, wh, h0, c0, None)[0])
        t_x = timeit(xla_f, xw, wh)
        try:
            t_p = timeit(pal_f, xw, wh)
        except Exception as e:  # noqa: BLE001
            t_p = float("nan")
            print(f"   pallas failed at B={B} T={T} H={H}: {e}")
        print(f"B={B:4d} T={T:4d} H={H:4d}  xla {t_x:.3f} ms vs pallas {t_p:.3f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_fused_mlp()
    bench_lstm()
