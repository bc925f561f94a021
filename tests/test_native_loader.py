"""Native batch-assembly core (native/batch_assembly.cpp via ctypes):
bit-equality with the numpy path, padding semantics, and BatchLoader
integration (batches identical whether the native path serves the gather
or numpy does)."""

import numpy as np
import pytest

from mmtpu.data import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.ensure_built() or not native.is_available():
        pytest.skip("C++ toolchain unavailable — native core not built")
    return True


def test_gather_rows_matches_numpy(lib_available, rng):
    for shape, dtype in (((200, 7, 3), np.float32), ((50, 16), np.int64),
                         ((31,), np.float64), ((100, 5), np.int32)):
        arr = (rng.normal(size=shape) * 100).astype(dtype)
        idx = np.array([0, 5, -1, shape[0] - 1, 3, -1])
        out = native.gather_rows(arr, idx)
        ref = arr[np.clip(idx, 0, shape[0] - 1)].copy()
        ref[idx < 0] = 0
        assert out.dtype == arr.dtype
        np.testing.assert_array_equal(out, ref)


def test_gather_rows_out_of_bounds_is_zero(lib_available):
    arr = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = native.gather_rows(arr, np.array([0, 99, -5, 3]))
    np.testing.assert_array_equal(out[1], 0)
    np.testing.assert_array_equal(out[2], 0)
    np.testing.assert_array_equal(out[0], arr[0])
    np.testing.assert_array_equal(out[3], arr[3])


def test_gather_mask_matches_numpy(lib_available, rng):
    m = rng.random((4, 64)) < 0.5
    pids = rng.integers(0, 4, 20)
    idx = rng.integers(0, 64, 20)
    idx[::5] = -1
    out = native.gather_mask(m, pids, idx)
    ref = m[pids, np.clip(idx, 0, 63)].astype(np.float32)
    ref[idx < 0] = 0.0
    np.testing.assert_array_equal(out, ref)


def test_non_contiguous_falls_back_to_none(lib_available):
    arr = np.arange(24, dtype=np.float32).reshape(4, 6)[:, ::2]
    assert not arr.flags["C_CONTIGUOUS"]
    assert native.gather_rows(arr, np.array([0, 1])) is None


def test_batchloader_batches_identical_native_vs_numpy(
    lib_available, monkeypatch, rng
):
    """Full loader epoch: identical batch streams whether the native core
    serves the gathers (multi-core host, threshold lowered so it actually
    engages) or the numpy path does (single-core host)."""
    from mmtpu.data import loader as loader_mod
    from mmtpu.data.avmnist import SyntheticAVMNIST

    calls = {"rows": 0, "mask": 0}
    real_rows, real_mask = native.gather_rows, native.gather_mask

    def counting_rows(*a, **k):
        calls["rows"] += 1
        return real_rows(*a, **k)

    def counting_mask(*a, **k):
        calls["mask"] += 1
        return real_mask(*a, **k)

    def batches(cpus):
        monkeypatch.setattr(loader_mod.os, "cpu_count", lambda: cpus)
        monkeypatch.setattr(loader_mod, "NATIVE_MIN_GATHER_BYTES", 0)
        monkeypatch.setattr(loader_mod, "NATIVE_MIN_MASK_ROWS", 0)
        monkeypatch.setattr(loader_mod.native, "gather_rows", counting_rows)
        monkeypatch.setattr(loader_mod.native, "gather_mask", counting_mask)
        ds = SyntheticAVMNIST(split="test", num_samples=37, seed=3)
        bl = loader_mod.BatchLoader(ds, batch_size=16, prefetch=0)
        return list(bl)

    a = batches(1)
    assert calls["rows"] == 0, "numpy path must not touch the native core"
    b = batches(8)
    assert calls["rows"] > 0 and calls["mask"] > 0, "native path never engaged"
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
    # tail batch is zero-padded to the fixed shape with sample_mask=0
    tail = a[-1]
    assert tail["sample_mask"].shape[0] == 16
    assert tail["sample_mask"].sum() < 16

def test_mask_stack_uint8_view_is_cached():
    """The loader passes a dataset-cached uint8 stack to the native core —
    repeated calls must return the same array (no per-batch O(patterns x N)
    conversion) and agree with the float32 stack."""
    from mmtpu.data.avmnist import SyntheticAVMNIST

    ds = SyntheticAVMNIST(split="test", num_samples=10, seed=0)
    mod = next(iter(ds.arrays))
    u8a = ds.mask_stack(mod, np.uint8)
    u8b = ds.mask_stack(mod, np.uint8)
    assert u8a is u8b
    assert u8a.dtype == np.uint8 and u8a.flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(u8a, ds.mask_stack(mod).astype(np.uint8))
