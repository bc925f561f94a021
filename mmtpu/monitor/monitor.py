"""Experiment monitoring: gradient / activation / weight capture → HDF5.

Reference: experiment_utils/monitoring/monitor.py:12-149 attaches torch
forward/grad hooks. The TPU-native equivalent avoids hooks entirely:

- gradient stats come from the grad pytree the train step already computes
  (a `grad_stats` variant of the step returns per-layer L2/mean/std scalars
  — still one compiled program, no extra passes),
- activations are captured every `activation_interval` steps with one extra
  forward under `capture_intermediates` (infrequent, amortized),
- weights are snapshotted per epoch from state.params.

All captured values are tiny reduced scalars/vectors, so the device→host
cost is negligible; BatchNorm/Dropout-style layers are excluded by default
like the reference (config/monitor_config.py:31-32).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.config.monitor import MonitorConfig
from mmtpu.monitor.storage import MonitorStorage
from mmtpu.utils.logging import get_logger

logger = get_logger()

DEFAULT_EXCLUDE = (r"[Bb]atch[Nn]orm", r"bn_?\d*", r"[Dd]ropout")


# Per-leaf statistic vector computed ON DEVICE in the fused step (the
# reference stores full tensors and computes these offline,
# monitoring/analysis/stats.py:12-55 — we compute the same measures at
# capture time so only a 17-float bundle crosses the host boundary).
STAT_COLUMNS = (
    "l2", "mean", "std", "min", "max",
    "l1", "median", "p5", "p25", "p75", "p95",
    "zero_fraction", "positive_fraction", "negative_fraction",
    "skewness", "kurtosis", "saturation_fraction",
)


def _leaf_stats(leaf: jnp.ndarray) -> jnp.ndarray:
    x = jnp.asarray(leaf, jnp.float32).reshape(-1)
    mean = jnp.mean(x)
    std = jnp.std(x)
    centered = x - mean
    safe = jnp.maximum(std, 1e-12)
    p5, p25, p50, p75, p95 = jnp.percentile(
        x, jnp.asarray([5.0, 25.0, 50.0, 75.0, 95.0])
    )
    return jnp.stack(
        [
            jnp.linalg.norm(x),
            mean,
            std,
            jnp.min(x),
            jnp.max(x),
            jnp.sum(jnp.abs(x)),
            p50,
            p5,
            p25,
            p75,
            p95,
            jnp.mean(jnp.abs(x) < 1e-7),
            jnp.mean(x > 0),
            jnp.mean(x < 0),
            jnp.mean((centered / safe) ** 3),
            jnp.mean((centered / safe) ** 4) - 3.0,
            jnp.mean(jnp.abs(x) > 0.99),
        ]
    )


def path_name(path) -> str:
    """Render a tree_flatten_with_path key path as the 'a/b/c' layer name —
    the ONE naming rule shared by tree_stats and record_weights (a drift
    between them would silently desynchronize their dict lookups)."""
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tree_stats(
    tree: Any, prefix: str = "", keep=None
) -> Dict[str, np.ndarray]:
    """Per-leaf STAT_COLUMNS vector — computed on device, fetched as one
    small bundle. `keep(name)` filters BEFORE the device reductions run, so
    excluded layers (BatchNorm/Dropout by default) cost nothing."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = prefix + path_name(path)
        if keep is not None and not keep(name):
            continue
        out[name] = _leaf_stats(leaf)
    return out


class ExperimentMonitor:
    STAT_COLUMNS = STAT_COLUMNS

    def __init__(
        self, config: MonitorConfig, output_path: str, resume: bool = False
    ) -> None:
        self.config = config
        self.storage = MonitorStorage(
            f"{output_path}/monitor_data.h5",
            buffer_size=config.buffer_size,
            compression=config.compression,
            compression_opts=config.compression_opts,
            # --resume must append to the prior run's capture, not wipe it
            mode="a" if resume else "w",
        )
        self.epoch = 0
        self.global_step = 0
        patterns = list(config.exclude_layers or DEFAULT_EXCLUDE)
        self._exclude = [re.compile(p) for p in patterns]
        self._include = [re.compile(p) for p in (config.include_layers or [])]

    def _keep(self, name: str) -> bool:
        # reference precedence (monitoring/monitor.py:94-99): exclusion wins
        # even over an explicit include list
        if any(p.search(name) for p in self._exclude):
            return False
        if self._include:
            return any(p.search(name) for p in self._include)
        return True

    # -- lifecycle ------------------------------------------------------------

    def start_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def step(self) -> None:
        """Advance the step counter AFTER a batch (reference cadence:
        capture fires when step_count % interval == 0 with the counter
        starting at 0, so the initial-gradient snapshot is included) and
        flush the buffers every flush_interval steps."""
        self.global_step += 1
        fi = int(getattr(self.config, "flush_interval", 0) or 0)
        if fi > 0 and self.global_step % fi == 0:
            self.storage.flush()

    def end_epoch(self, state) -> None:
        if self.config.enable_weight_tracking:
            self.record_weights(state.params)
        self.storage.flush()

    def close(self) -> None:
        self.storage.close()

    # -- capture ------------------------------------------------------------

    @property
    def want_gradients(self) -> bool:
        return (
            self.config.enable_gradient_tracking
            and self.global_step % max(self.config.gradient_interval, 1) == 0
        )

    @property
    def want_activations(self) -> bool:
        return (
            self.config.enable_activation_tracking
            and self.global_step % max(self.config.activation_interval, 1) == 0
        )

    def record_gradients(self, grad_stats: Dict[str, Any]) -> None:
        host = jax.device_get(grad_stats)
        for name, stats in host.items():
            if not self._keep(name):
                continue
            self.storage.append(
                "gradients",
                f"epoch_{self.epoch}/step_{self.global_step}/{name}",
                np.asarray(stats),
                {"columns": ",".join(self.STAT_COLUMNS)},
            )

    def record_activations(self, model, variables, batch_inputs: List[Any]) -> None:
        _, inter = model.apply(
            variables,
            *batch_inputs,
            train=False,
            capture_intermediates=True,
            mutable=["intermediates"],
        )
        stats = tree_stats(inter["intermediates"])
        host = jax.device_get(stats)
        for name, s in host.items():
            if not self._keep(name):
                continue
            self.storage.append(
                "activations",
                f"epoch_{self.epoch}/step_{self.global_step}/{name}",
                np.asarray(s),
                {"columns": ",".join(self.STAT_COLUMNS)},
            )

    def record_weights(self, params: Any) -> None:
        host = jax.device_get(tree_stats(params, keep=self._keep))
        raw = {}
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            raw[path_name(path)] = leaf
        for name, s in host.items():
            self.storage.append(
                "weights",
                f"epoch_{self.epoch}/{name}",
                np.asarray(s),
                {"columns": ",".join(self.STAT_COLUMNS)},
            )
            # matrix-shape measures the scalar bundle can't carry
            # (reference compute_weight_stats, stats.py:58-73) — check the
            # shape BEFORE transferring so only 2-D kernels cross the host
            # boundary
            if raw[name].ndim != 2 or min(raw[name].shape) <= 1:
                continue
            leaf = np.asarray(jax.device_get(raw[name]))
            sv = np.linalg.svd(leaf, compute_uv=False)
            tol = sv.max() * max(leaf.shape) * np.finfo(np.float32).eps
            spectral = {
                "spectral_norm": float(sv[0]),
                "effective_rank": float(np.sum(sv > tol)),
                "condition_number": float(
                    sv[0] / max(sv[-1], np.finfo(np.float32).tiny)
                ),
            }
            if leaf.shape[0] == leaf.shape[1]:
                spectral["symmetry"] = float(np.mean(np.abs(leaf - leaf.T)))
            self.storage.append(
                "weights",
                f"epoch_{self.epoch}/{name}__spectral",
                np.asarray(list(spectral.values()), np.float32),
                {"columns": ",".join(spectral.keys())},
            )
        if self.config.enable_layer_convergence:
            # convergence proxy: per-layer weight L2 trajectory, over the
            # same layer set the weights group records (host is already
            # _keep-filtered by tree_stats)
            names = sorted(host)
            l2 = np.asarray([host[k][0] for k in names])
            self.storage.append(
                "convergence", f"epoch_{self.epoch}/weight_l2", l2,
                {"layers": ";".join(names)},
            )
