"""Experiment-level configuration (reference: config/experiment_config.py:17-135).

Differences by design: seeding produces a JAX PRNG key (functional, explicit)
in addition to seeding NumPy for host-side mask synthesis; `device` selects a
JAX backend ("cuda"/"gpu"/"tpu" → accelerator if present, else CPU fallback,
mirroring the reference's cuda→cpu fallback).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from mmtpu.config.base import BaseConfig
from mmtpu.utils.logging import get_logger
from mmtpu.utils.printing import get_console

logger = get_logger()
console = get_console()


@dataclass
class ExperimentConfig(BaseConfig):
    name: str
    seed: Optional[int] = None
    device: str = "tpu"
    debug: bool = False
    run_id: int = field(default_factory=lambda: int(time.time()))
    is_test: bool = True
    is_train: bool = True
    train_print_interval_epochs: int = 1
    validation_print_interval_epochs: int = 1
    dry_run: bool = False
    cross_validation: Optional[int] = None
    # TPU matmul/conv precision: "bf16" runs MXU passes in bfloat16 with
    # fp32 params/accumulation (fast path), "f32" forces full precision.
    precision: Optional[str] = None
    # Data parallelism over the device mesh (SURVEY §2.2 — the capability the
    # single-device reference lacks): None/0/1 → single device; -1 → all
    # visible devices; N → an N-device 'data' mesh axis. Batches are sharded
    # over the axis, parameters replicated; XLA inserts the ICI gradient
    # psum. Overridable with the --data-parallel CLI flag.
    data_parallel: Optional[int] = None

    def __post_init__(self) -> None:
        assert self.train_print_interval_epochs > 0
        assert self.validation_print_interval_epochs > 0
        if self.cross_validation:
            assert self.cross_validation > 0
        if self.seed is None:
            self.seed = int(time.time())
        np.random.seed(self.seed)
        self._platform = self._resolve_platform()
        logger.info(
            f"Experiment {self.name!r}: seed={self.seed} platform={self._platform}"
        )

    def _resolve_platform(self) -> str:
        """Map requested device to the available JAX backend."""
        import jax

        want = str(self.device).lower()
        backend = jax.default_backend()
        if want in ("cpu",):
            return "cpu"
        # Any accelerator request ("cuda", "gpu", "tpu") → default backend,
        # which is the TPU when present; falls back to CPU like the reference.
        return backend

    @property
    def platform(self) -> str:
        return self._platform

    def prng_key(self):
        """Root PRNG key for parameter init / dropout."""
        import jax

        return jax.random.PRNGKey(self.seed)
