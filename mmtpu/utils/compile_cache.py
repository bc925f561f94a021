"""Persistent XLA compilation cache, keyed per host CPU.

XLA:CPU AOT results embed LLVM target-machine features; loading an entry
compiled on a different machine logs "Machine type used for XLA:CPU
compilation doesn't match ... could lead to execution errors such as
SIGILL". So CPU backends must only ever read a cache directory keyed by
this host's CPU fingerprint; TPU executables come back from the compile
service host-independent and may share an unkeyed directory.

jax DOES read the JAX_COMPILATION_CACHE_DIR env var at import time (the
config state defaults from the environment) — which is exactly the hazard:
a caller exporting the raw cache root points a CPU-backend process at a
directory other hosts write. `enable_for_backend` / `enable_env_dir`
detect that and redirect CPU backends to the host-keyed subdirectory.

Note on loader noise: this jax build's cpu_aot_loader compares an entry's
COMPILE feature string (which includes preference pseudo-features like
+prefer-no-gather/+prefer-no-scatter) against the raw CPUID host feature
list (which never contains pseudo-features), so reloading an entry this
very host wrote still logs the "machine type ... doesn't match" warning.
Verified empirically (fresh dir, compile then reload in a second process:
warning fires). Only genuinely foreign ISA features are a SIGILL hazard;
the keyed directory guarantees those never appear.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_key() -> str:
    """12-hex fingerprint of this host's CPU.

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
    return hashlib.sha1(fingerprint.encode()).hexdigest()[:12]


def host_cache_dir(root: str) -> str:
    """`<root>/.cache/jax/<12-hex CPU fingerprint>`."""
    return os.path.join(root, ".cache", "jax", _host_key())


def is_host_keyed(path: str) -> bool:
    """True when `path` is already THIS host's keyed directory (its last
    component is the current fingerprint)."""
    return os.path.basename(os.path.normpath(path)) == _host_key()


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
    force: bool = False,
) -> None:
    """Point jax's persistent compile cache at `cache_dir`.

    Idempotent by default: a directory already configured (by an earlier
    call OR by jax honoring the env var at import) is left alone. Pass
    `force=True` to override a pre-set directory — the backend-aware
    entry points use it to move a CPU backend off an unkeyed dir."""
    import jax

    if jax.config.jax_compilation_cache_dir and not force:
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
    the per-host keyed subdir — even when the env var pre-configured an
    unkeyed directory (that pre-set dir is re-keyed, never read raw)."""
    import jax

    if jax.default_backend() == "cpu":
        current = jax.config.jax_compilation_cache_dir
        if current and not is_host_keyed(current):
            # env-provided unkeyed dir: redirect to its host-keyed subdir
            enable(os.path.join(current, _host_key()), force=True)
        else:
            enable(host_cache_dir(root))
    else:
        enable(os.path.join(root, ".cache", "jax"))


def enable_env_dir(
    cache_dir: str,
    min_compile_time_secs: float = 0.0,
    min_entry_size_bytes: int = -1,
) -> None:
    """Honor a caller/env-provided cache directory, host-keying it first
    when the active backend is CPU (cross-host XLA:CPU AOT entries risk
    SIGILL; see module docstring)."""
    import jax

    if jax.default_backend() == "cpu" and not is_host_keyed(cache_dir):
        enable(
            os.path.join(cache_dir, _host_key()),
            min_compile_time_secs, min_entry_size_bytes, force=True,
        )
    else:
        enable(cache_dir, min_compile_time_secs, min_entry_size_bytes)
