// Native batch-assembly core for the mmtpu host data path.
//
// The TPU-side contract (mmtpu/data/loader.py) is fixed-shape batches:
// every step's batch is a row-gather of the in-memory split arrays plus
// zero-padding of the tail batch. This is the framework's analogue of the
// native worker core behind the reference's torch DataLoader
// (reference config/data_config.py:122 `num_workers`): the gather runs in
// GIL-released C++ threads so batch assembly overlaps Python-side dispatch.
//
// C ABI only — loaded via ctypes (no pybind11 in this image).
//
// Semantics: dst row i  =  src row idx[i]   when 0 <= idx[i] < n_src
//                        = zeros            when idx[i] < 0 (padding)
// idx[i] >= n_src is a caller bug; it is clamped to zero-fill as well so
// the native path can never read out of bounds.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// Gather n_idx rows of row_bytes bytes each from src into dst.
// n_threads <= 0 selects a heuristic (1 thread per ~4 MB of output,
// capped at hardware_concurrency).
void mm_gather_rows(const char *src, int64_t row_bytes, int64_t n_src,
                    const int64_t *idx, int64_t n_idx, char *dst,
                    int n_threads) {
  if (n_idx <= 0 || row_bytes <= 0) return;

  auto copy_range = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      char *out = dst + i * row_bytes;
      int64_t j = idx[i];
      if (j >= 0 && j < n_src) {
        std::memcpy(out, src + j * row_bytes, (size_t)row_bytes);
      } else {
        std::memset(out, 0, (size_t)row_bytes);
      }
    }
  };

  int hw = (int)std::thread::hardware_concurrency();
  if (hw <= 0) hw = 1;
  if (n_threads <= 0) {
    int64_t total = n_idx * row_bytes;
    n_threads = (int)std::min<int64_t>(hw, std::max<int64_t>(1, total >> 22));
  }
  n_threads = (int)std::min<int64_t>(n_threads, n_idx);

  if (n_threads <= 1) {
    copy_range(0, n_idx);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, n_idx);
    if (lo >= hi) break;
    pool.emplace_back(copy_range, lo, hi);
  }
  for (auto &th : pool) th.join();
}

// 2-D mask gather: out[i] = mask[pids[i] * n_cols + idx[i]] as float32,
// 0.0f for padding rows (idx[i] < 0). Replaces the per-batch numpy
// `mask_stack[pids, idx]` advanced indexing.
void mm_gather_mask(const uint8_t *mask, int64_t n_rows, int64_t n_cols,
                    const int64_t *pids, const int64_t *idx, int64_t n,
                    float *out) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t p = pids[i], j = idx[i];
    if (p >= 0 && p < n_rows && j >= 0 && j < n_cols) {
      out[i] = (float)mask[p * n_cols + j];
    } else {
      out[i] = 0.0f;
    }
  }
}

int mm_abi_version(void) { return 1; }

}  // extern "C"
