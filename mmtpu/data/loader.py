"""Fixed-shape batch loader with background prefetch.

The TPU-side contract (SURVEY.md §7): every batch has identical shapes so
the jitted step compiles exactly once per split. Partial tail batches are
zero-padded and carry `sample_mask`; per-modality keep-masks ride along as
(B,) vectors multiplied on device.

Batch schema:
    {mod}:        raw modality array (B, ...)
    {mod}_mask:   keep-mask (B,) float32
    labels:       (B,) or (B, C)
    pattern_id:   (B,) int32 into dataset.pattern_vocab()
    sample_mask:  (B,) float32 — 0 for padded rows
Optional per-modality lengths arrays ({mod}_lengths) for sequence models.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from mmtpu.data import native
from mmtpu.data.base import MultimodalArrayDataset
from mmtpu.modalities import Modality


# below this output size numpy's fancy indexing beats the ctypes round-trip
NATIVE_MIN_GATHER_BYTES = 1 << 20
# mask gathers move (batch,) scalars, not rows — the byte gate above would
# demand batch >= 262144 and made the native mask path unreachable. Measured
# crossover (uint8 stack (4, 60k), this host): numpy wins <= 1024 rows
# (13.8 vs 17.4 us), native wins >= 8192 (62.8 vs 26.7 us)
NATIVE_MIN_MASK_ROWS = 4096


class BatchLoader:
    def __init__(
        self,
        dataset: MultimodalArrayDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    # -- sizing -------------------------------------------------------------

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def pattern_vocab(self) -> List[str]:
        return self.dataset.pattern_vocab()

    # -- iteration ------------------------------------------------------------

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        it = self._epoch_batches()
        if self.prefetch <= 0:
            try:
                yield from it
            finally:
                # like the prefetching path: an abandoned epoch still
                # advances the counter so a retry gets a fresh
                # shuffle/pattern schedule
                self.epoch += 1
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: List[BaseException] = []
        cancel = threading.Event()

        def worker():
            try:
                for b in it:
                    while not cancel.is_set():
                        try:
                            q.put(b, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if cancel.is_set():
                        return
            except BaseException as e:  # noqa: BLE001
                error.append(e)
            finally:
                # The sentinel must never be dropped: with a slower consumer
                # the queue is routinely full here, and a lost sentinel
                # deadlocks the consumer on q.get(). Retry with the same
                # cancel-aware loop used for batches.
                while not cancel.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            if error:
                raise error[0]
        finally:
            # consumer abandoned mid-epoch (break/exception): unblock and
            # reap the worker; the epoch counter still advances so a retry
            # gets a fresh shuffle/pattern schedule
            cancel.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=2.0)
            self.epoch += 1

    def _epoch_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        ds = self.dataset
        mods = list(ds.AVAILABLE_MODALITIES.values())
        vocab = ds.pattern_vocab()

        if ds.split == "train":
            order = np.arange(ds.num_samples)
            if self.shuffle:
                rng = np.random.default_rng((self.seed, self.epoch, 0x5EED))
                rng.shuffle(order)
            pattern_idx = ds.train_schedule(self.epoch)
            sample_idx = order
            pattern_of = pattern_idx[order]
        else:
            # pattern-major deterministic blocks: (pattern, sample) product
            n = ds.num_samples
            sample_idx = np.tile(np.arange(n), len(vocab))
            pattern_of = np.repeat(np.arange(len(vocab)), n)

        total = sample_idx.shape[0]
        bs = self.batch_size
        n_batches = total // bs if self.drop_last else -(-total // bs)

        # Native C++ gather (GIL-released threads, native/batch_assembly.cpp)
        # only where it can win: multi-core hosts, where assembly in the
        # prefetch thread overlaps the consumer's dispatch instead of
        # serializing on the GIL. On 1-core hosts numpy's single-thread
        # memcpy is already optimal (measured: 1.6 vs 1.8 ms at the AVMNIST
        # B=1024 shape) and ctypes overhead loses on small rows.
        use_native = bool(os.cpu_count() and os.cpu_count() > 1)

        def gather(arr: np.ndarray, idx_pad: np.ndarray) -> np.ndarray:
            """arr[idx_pad] with zero rows where idx_pad < 0 (tail padding)."""
            if use_native and arr.nbytes and idx_pad.size * arr.itemsize * max(
                1, int(np.prod(arr.shape[1:], dtype=np.int64))
            ) >= NATIVE_MIN_GATHER_BYTES:
                out = native.gather_rows(arr, idx_pad)
                if out is not None:
                    return out
            out = arr[np.clip(idx_pad, 0, arr.shape[0] - 1)]
            out[idx_pad < 0] = 0
            return out

        def keep_mask(m: np.ndarray, pids, idx_pad) -> np.ndarray:
            """float32 mask_stack[pids, idx_pad], 0 for padding rows.

            `m` is the dataset-cached uint8 stack (binary keep masks), so
            the native path does no per-call dtype conversion; only the
            (batch,) output is allocated here. Row-count gate (see
            NATIVE_MIN_MASK_ROWS): below it the ctypes round-trip costs
            more than numpy fancy-indexing."""
            if use_native and idx_pad.size >= NATIVE_MIN_MASK_ROWS:
                out = native.gather_mask(m, pids, idx_pad)
                if out is not None:
                    return out
            keep = m[pids, np.clip(idx_pad, 0, m.shape[1] - 1)].astype(np.float32)
            keep[idx_pad < 0] = 0.0
            return keep

        for b in range(n_batches):
            sl = slice(b * bs, (b + 1) * bs)
            idx = sample_idx[sl]
            pids = pattern_of[sl]
            real = idx.shape[0]
            if real < bs:  # fixed shapes: pad the index vectors, not arrays
                idx = np.concatenate([idx, np.full(bs - real, -1, idx.dtype)])
                pids = np.concatenate([pids, np.zeros(bs - real, pids.dtype)])
            batch: Dict[str, np.ndarray] = {}
            for mod in mods:
                if ds.target_modality not in (Modality.MULTIMODAL, mod):
                    continue
                batch[str(mod)] = gather(ds.arrays[mod], idx)
                batch[f"{mod}_mask"] = keep_mask(
                    ds.mask_stack(mod, np.uint8), pids, idx
                )
                lengths = getattr(ds, "lengths", {}).get(mod)
                if lengths is not None:
                    batch[f"{mod}_lengths"] = gather(lengths, idx)
            batch["labels"] = gather(ds.labels, idx)
            batch["sample_idx"] = np.maximum(idx, 0).astype(np.int32)
            batch["pattern_id"] = pids.astype(np.int32)
            batch["sample_mask"] = (idx >= 0).astype(np.float32)
            yield batch


def build_loader(
    dataset: MultimodalArrayDataset,
    batch_size: int,
    shuffle: bool = False,
    drop_last: bool = False,
    seed: int = 0,
) -> BatchLoader:
    return BatchLoader(
        dataset, batch_size=batch_size, shuffle=shuffle, drop_last=drop_last, seed=seed
    )


class DevicePrefetcher:
    """Wrap a BatchLoader: device_put (sharded) one batch ahead.

    transfer_dtype='bfloat16' halves host→device bytes for the EXPLICITLY
    listed transfer_keys — worthwhile when transfers ride a slow link (here:
    the axon tunnel, ~16 MB/s) and the dataset exceeds the device-resident
    budget. Keys must be opted in because some float32 payloads carry
    integer content (e.g. BERT token-id rows) that bf16 would corrupt.
    """

    def __init__(
        self, loader: BatchLoader, mesh=None, transfer_dtype=None,
        transfer_keys=None,
    ):
        self.loader = loader
        self.mesh = mesh
        self.transfer_dtype = transfer_dtype
        self.transfer_keys = set(transfer_keys or ())

    def _compress(self, batch):
        if self.transfer_dtype is None or not self.transfer_keys:
            return batch
        import ml_dtypes

        dtype = np.dtype(ml_dtypes.bfloat16) if self.transfer_dtype in (
            "bfloat16", "bf16"
        ) else np.dtype(self.transfer_dtype)
        return {
            k: v.astype(dtype)
            if k in self.transfer_keys and v.dtype == np.float32
            else v
            for k, v in batch.items()
        }

    def __len__(self) -> int:
        return len(self.loader)

    @property
    def pattern_vocab(self):
        return self.loader.pattern_vocab

    def __iter__(self):
        from mmtpu.parallel.mesh import shard_batch
        import jax

        prev: Optional[Any] = None
        for host_batch in self.loader:
            host_batch = self._compress(host_batch)
            nxt = (
                shard_batch(host_batch, self.mesh)
                if self.mesh is not None
                else jax.device_put(host_batch)
            )
            if prev is not None:
                yield prev
            prev = nxt
        if prev is not None:
            yield prev
