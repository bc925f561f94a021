"""fd-level filter for XLA:CPU AOT loader's benign pseudo-feature warnings.

This jax build's cpu_aot_loader compares an AOT entry's COMPILE feature
string against the host's raw CPUID feature list. The compile string
includes LLVM *tuning pseudo-features* (+prefer-no-gather,
+prefer-no-scatter — preferences derived from the CPU model/mitigations,
not ISA extensions), which CPUID lists never contain — so reloading an
entry written by THIS VERY HOST still logs
"Machine type used for XLA:CPU compilation doesn't match ... SIGILL"
(see mmtpu/utils/compile_cache.py docstring; verified empirically).

The warning is emitted by C++ glog straight to fd 2, so Python logging
cannot intercept it. This module dups fd 2 through a pipe and drops ONLY
lines whose unsupported-feature list consists of pseudo-features; a
mismatch naming any real ISA feature (an actual cross-machine load, the
genuine SIGILL hazard the host-keyed cache prevents) passes through
untouched.
"""

from __future__ import annotations

import contextlib
import os
import re
import sys
import threading

#: "Target machine feature +X is not supported" — the loader logs one such
#: clause per missing feature inside one long line.
_FEATURE_RE = re.compile(r"Target machine feature \+([\w.-]+) is not\s+supported")

_PSEUDO_PREFIXES = ("prefer-",)


def _is_benign(line: str) -> bool:
    """True iff the line is an AOT-loader mismatch whose unsupported
    features are all tuning pseudo-features."""
    if "cpu_aot_loader" not in line or "doesn't match" not in line:
        return False
    feats = _FEATURE_RE.findall(line)
    return bool(feats) and all(
        f.startswith(_PSEUDO_PREFIXES) for f in feats
    )


@contextlib.contextmanager
def suppress_benign_aot_warnings():
    """Route fd 2 through a line filter for the duration of the block.

    Python-level sys.stderr keeps writing to the REAL stderr directly
    (only native writes ride the filtered fd), so interleaving and
    tracebacks stay ordered; the filter thread forwards native lines
    as they complete.
    """
    real_fd = os.dup(2)
    read_fd, write_fd = os.pipe()
    os.dup2(write_fd, 2)
    os.close(write_fd)

    # Python writes bypass the pipe. Keep our OWN reference to the file
    # object we install: code inside the block may rebind sys.stderr
    # (pytest capture, logging reconfig), and the cleanup must close THIS
    # object — closing whatever sys.stderr happens to be at exit would
    # close a foreign stream and leak our dup of the real fd.
    orig_stderr = sys.stderr
    our_stderr = os.fdopen(os.dup(real_fd), "w", buffering=1)
    sys.stderr = our_stderr

    def pump():
        buf = b""
        with os.fdopen(read_fd, "rb", buffering=0) as r:
            while True:
                chunk = r.read(65536)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    _forward(line + b"\n")
            if buf:
                _forward(buf)

    def _forward(raw: bytes) -> None:
        try:
            if _is_benign(raw.decode("utf-8", "replace")):
                return
        except Exception:
            pass
        os.write(real_fd, raw)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        yield
    finally:
        # restore fd 2, closing the pipe's write end so the pump drains out
        os.dup2(real_fd, 2)
        t.join(timeout=10)
        our_stderr.close()
        if sys.stderr is our_stderr:  # leave any in-block rebinding alone
            sys.stderr = orig_stderr
        if t.is_alive():
            # A child that inherited the pipe's write end keeps the pump
            # blocked past the timeout. Closing real_fd now would race the
            # pump's os.write into whatever reuses the fd number next —
            # deliberately LEAK the single fd instead (the pump still
            # forwards any stragglers to the real stderr it points at).
            return
        os.close(real_fd)
