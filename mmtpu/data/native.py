"""ctypes bindings for the native batch-assembly core (native/).

The reference's async data loading is torch DataLoader `num_workers`
(reference config/data_config.py:122) — native worker processes behind a
Python API. mmtpu's analogue is a C++ row-gather core (GIL-released
threads) used by BatchLoader for the hot per-batch operations:

- `gather_rows(arr, idx)`  — fixed-shape batch gather with zero-padding
  for idx < 0 (replaces `arr[idx]` + tail `np.concatenate`)
- `gather_mask(mask2d, pids, idx)` — per-modality keep-mask lookup

Falls back to numpy transparently when the shared library is absent or
`MMTPU_NATIVE=0`. `ensure_built()` compiles it on first use when a C++
toolchain is available (single translation unit, <1 s).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_NAME = "libbatch_assembly.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _disabled() -> bool:
    return os.environ.get("MMTPU_NATIVE", "1") in ("0", "false", "off")


def ensure_built() -> bool:
    """Build the shared library if missing. True if it exists afterwards.

    Cross-process safe: concurrent trainers (e.g. a sweep) serialize the
    build on an flock'd lockfile so no process can dlopen a half-written
    .so and silently pin itself to the numpy fallback."""
    lib_path = _NATIVE_DIR / _LIB_NAME
    if lib_path.exists():
        return True
    src = _NATIVE_DIR / "batch_assembly.cpp"
    if not src.exists():
        return False
    try:
        import fcntl

        with open(_NATIVE_DIR / ".build.lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if not lib_path.exists():  # another process may have built it
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    capture_output=True, timeout=120, check=True,
                )
    except (OSError, ImportError, subprocess.SubprocessError):
        return False
    return lib_path.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _disabled() or not ensure_built():
            return None
        try:
            lib = ctypes.CDLL(str(_NATIVE_DIR / _LIB_NAME))
            lib.mm_gather_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.mm_gather_mask.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ]
            lib.mm_abi_version.restype = ctypes.c_int
            if lib.mm_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def is_available() -> bool:
    return _load() is not None


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_rows(arr: np.ndarray, idx: np.ndarray,
                n_threads: int = 0) -> Optional[np.ndarray]:
    """out[i] = arr[idx[i]] (zeros where idx[i] < 0), shape (len(idx), ...).

    Returns None when the native path can't serve this array (lib absent,
    non-contiguous input) — caller falls back to numpy.
    """
    lib = _load()
    if lib is None or not arr.flags["C_CONTIGUOUS"] or arr.ndim < 1:
        return None
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((idx.shape[0],) + arr.shape[1:], arr.dtype)
    row_bytes = arr.itemsize * int(np.prod(arr.shape[1:], dtype=np.int64))
    if row_bytes == 0:
        return out
    lib.mm_gather_rows(
        arr.ctypes.data_as(ctypes.c_char_p), row_bytes, arr.shape[0],
        _i64(idx), idx.shape[0],
        out.ctypes.data_as(ctypes.c_char_p), n_threads,
    )
    return out


def gather_mask(mask2d: np.ndarray, pids: np.ndarray,
                idx: np.ndarray) -> Optional[np.ndarray]:
    """out[i] = float32(mask2d[pids[i], idx[i]]), 0.0 where idx[i] < 0."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask2d, np.uint8)
    pids = np.ascontiguousarray(pids, np.int64)
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((idx.shape[0],), np.float32)
    lib.mm_gather_mask(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], _i64(pids), _i64(idx), idx.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
