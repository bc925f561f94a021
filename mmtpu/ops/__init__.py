"""Pallas kernels + the global XLA-only escape hatch.

`xla_only()` forces every shape-dispatched kernel (lstm_sequence, the
fused-MLP eval head) through its pure-XLA fallback for the duration of a
trace. Used by mmtpu.serving.export: a multi-platform (cpu+tpu) or
symbolic-batch `jax.export` cannot lower Pallas kernels for CPU, and the
kernels' admission checks compare batch dimensions that may be symbolic
there. The fallbacks are mathematically identical (tested bit-exact in
tests/test_ops*.py), so artifacts exported this way match the in-process
forward.
"""

import contextlib

from mmtpu.ops.fused_mlp import fused_mlp

_FORCE_XLA = False


def xla_forced() -> bool:
    return _FORCE_XLA


@contextlib.contextmanager
def xla_only():
    """Trace shape-dispatched ops through their XLA fallbacks."""
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev


__all__ = ["fused_mlp", "xla_only", "xla_forced"]
