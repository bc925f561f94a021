"""Persistent XLA compilation cache, keyed per host CPU.

jax 0.9 ignores the JAX_COMPILATION_CACHE_DIR env var (the config default
stays None with it set), so callers must apply the config explicitly —
`enable()` does that. The cache directory is keyed by the host's CPU
feature set: XLA:CPU AOT results embed machine features, and loading an
entry compiled on a different machine logs
"Machine type used for XLA:CPU compilation doesn't match ... could lead
to execution errors such as SIGILL". Keying the directory avoids ever
loading another host's AOT artifacts (TPU entries are keyed by the
accelerator inside the cache key itself, but live in the same per-host
dir — harmless).
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_cache_dir(root: str) -> str:
    """`<root>/.cache/jax/<12-hex CPU fingerprint>`.

    The fingerprint must cover everything XLA's target-machine detection
    reads, not just the CPUID feature list: two hosts with identical
    cpuinfo `flags` got different AOT target features (+prefer-no-scatter
    / +prefer-no-gather — LLVM tuning choices derived from the CPU model
    and active mitigations, observed across VM reboots of this image), so
    the model name, stepping, microcode, and `bugs` (mitigation) lines are
    hashed in as well.
    """
    try:
        with open("/proc/cpuinfo") as f:
            fingerprint = _fingerprint_from_cpuinfo(f.read())
    except OSError:
        fingerprint = ""
    fingerprint = fingerprint or (platform.processor() or platform.machine())
    key = hashlib.sha1(fingerprint.encode()).hexdigest()[:12]
    return os.path.join(root, ".cache", "jax", key)


def _fingerprint_from_cpuinfo(text: str) -> str:
    """Lines of the first processor block that XLA's target detection can
    depend on. x86 spells the ISA list "flags"; aarch64 spells it
    "Features"."""
    keys = ("flags", "Features", "model name", "stepping", "microcode", "bugs")
    block = text.split("\n\n", 1)[0].splitlines()
    return "\n".join(ln for ln in block if ln.startswith(keys))


def enable(
    cache_dir: str,
    min_compile_time_secs: float = 0.0,
    min_entry_size_bytes: int = -1,
) -> None:
    """Point jax's persistent compile cache at `cache_dir` (idempotent:
    no-op if a cache dir is already configured)."""
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", min_entry_size_bytes
    )


def enable_for_backend(root: str) -> None:
    """Enable the cache in the right directory for the active backend.

    Only XLA:CPU compiles produce host-specific AOT binaries; TPU
    executables come back from the compile service host-independent and
    live in the shared `<root>/.cache/jax` dir (so e.g. bench.py reuses
    TPU entries cached by earlier runs on any host). The CPU backend gets
    the per-host keyed subdir."""
    import jax

    if jax.default_backend() == "cpu":
        enable(host_cache_dir(root))
    else:
        enable(os.path.join(root, ".cache", "jax"))
