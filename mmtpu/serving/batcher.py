"""Online-serving micro-batcher: single requests → padded MXU batches.

TPU inference wants large fixed-shape batches (one XLA compile per shape,
MXU utilization scales with rows); online traffic arrives one sample at a
time. `MicroBatcher` sits between: requests enqueue, a worker thread groups
them (up to `max_batch` or `max_wait_ms`, whichever first), pads the group
to the next power-of-two bucket so only log2(max_batch)+1 shapes ever
compile, runs the predict function once, and resolves each request's
Future with its row slice.

Works with either an in-process `Predictor` or a deserialized
`ServedModel` (both take positional arrays and return a dict of batched
outputs). Pure stdlib threading — no external queue/server dependency.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, Sequence

import numpy as np


def _next_bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class MicroBatcher:
    def __init__(
        self,
        predict_fn: Callable[..., Dict[str, Any]],
        input_keys: Sequence[str],
        *,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
    ) -> None:
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.predict_fn = predict_fn
        self.input_keys = tuple(str(k) for k in input_keys)
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "rows": 0, "padded_rows": 0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side ---------------------------------------------------------

    def submit(self, sample: Dict[str, Any]) -> Future:
        """Enqueue one UNBATCHED sample ({input_key: array}); returns a
        Future resolving to {output_key: row} (no batch dim)."""
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        missing = [k for k in self.input_keys if k not in sample]
        if missing:
            raise KeyError(f"sample missing inputs {missing}")
        fut: Future = Future()
        self._q.put((sample, fut))
        return fut

    def __call__(self, sample: Dict[str, Any]) -> Dict[str, np.ndarray]:
        """Blocking convenience: submit + wait."""
        return self.submit(sample).result()

    def close(self) -> None:
        """Drain outstanding requests, then stop the worker."""
        if self._closed:
            return
        self._closed = True
        self._q.put(None)  # sentinel
        self._worker.join()
        # a submit() that passed the closed check concurrently with close()
        # may have enqueued after the worker's final drain — fail those
        # futures rather than leaving their callers waiting forever
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("MicroBatcher is closed"))

    def __enter__(self) -> "MicroBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- worker side -----------------------------------------------------------

    def _collect(self):
        """Block for the first request, then gather until max_batch or the
        wait window closes. Returns (group, saw_sentinel)."""
        first = self._q.get()
        if first is None:
            return [], True
        group = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                return group, True
            group.append(item)
        return group, False

    def _run(self) -> None:
        while True:
            group, done = self._collect()
            if group:
                self._process(group)
            if done:
                # resolve anything that raced in after the sentinel
                leftovers = []
                while True:
                    try:
                        item = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if item is not None:
                        leftovers.append(item)
                if leftovers:
                    self._process(leftovers)
                return

    def _process(self, group) -> None:
        samples = [s for s, _ in group]
        futures = [f for _, f in group]
        n = len(samples)
        bucket = _next_bucket(n, self.max_batch)
        try:
            inputs = []
            for key in self.input_keys:
                rows = np.stack([np.asarray(s[key]) for s in samples])
                if bucket > n:  # pad with the first row (shape-only filler)
                    pad = np.broadcast_to(
                        rows[:1], (bucket - n,) + rows.shape[1:]
                    )
                    rows = np.concatenate([rows, pad])
                inputs.append(rows)
            out = self.predict_fn(*inputs)
            out = {k: np.asarray(v) for k, v in out.items()}
            for i, fut in enumerate(futures):
                fut.set_result({k: v[i] for k, v in out.items()})
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["rows"] += n
            self.stats["padded_rows"] += bucket - n
        except Exception as e:  # resolve every waiter; server stays up
            for fut in futures:
                if not fut.done():
                    fut.set_exception(e)
