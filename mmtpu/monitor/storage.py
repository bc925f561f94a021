"""Buffered HDF5 sink for monitoring data.

Reference: experiment_utils/monitoring/storage.py:14 — `monitor_data.h5`
with groups gradients/activations/weights/convergence, gzip compression,
buffered writes flushed every `flush_interval` steps.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from mmtpu.utils.logging import get_logger

logger = get_logger()

GROUPS = ("gradients", "activations", "weights", "convergence")


class MonitorStorage:
    def __init__(
        self,
        path: str | Path,
        buffer_size: int = 1000,
        compression: Optional[str] = "gzip",
        compression_opts: int = 4,
        mode: str = "w",
    ) -> None:
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.buffer_size = buffer_size
        self.compression = compression
        self.compression_opts = compression_opts
        self._buffer: List[Tuple[str, str, Dict[str, Any], np.ndarray]] = []
        import h5py

        # mode 'a' preserves a prior run's captures (--resume); 'w' starts
        # a fresh file
        self._file = h5py.File(self.path, mode)
        for g in GROUPS:
            if g not in self._file:
                self._file.create_group(g)

    def append(
        self, group: str, name: str, data: np.ndarray, attrs: Optional[Dict] = None
    ) -> None:
        if group not in GROUPS:
            raise ValueError(f"Unknown monitor group: {group}")
        self._buffer.append((group, name, attrs or {}, np.asarray(data)))
        if len(self._buffer) >= self.buffer_size:
            self.flush()

    def flush(self) -> None:
        for group, name, attrs, data in self._buffer:
            grp = self._file[group]
            if name in grp:
                del grp[name]
            kwargs = {}
            if self.compression and data.ndim > 0 and data.size > 1:
                kwargs = dict(
                    compression=self.compression,
                    compression_opts=self.compression_opts,
                )
            ds = grp.create_dataset(name, data=data, **kwargs)
            for k, v in attrs.items():
                ds.attrs[k] = v
        self._buffer.clear()
        self._file.flush()

    def close(self) -> None:
        self.flush()
        self._file.close()
