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


def tree_stats(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Per-leaf [l2, mean, std, min, max] — computed on device, fetched as
    one small bundle."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = prefix + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        leaf = jnp.asarray(leaf, jnp.float32)
        out[name] = jnp.stack(
            [
                jnp.linalg.norm(leaf.reshape(-1)),
                jnp.mean(leaf),
                jnp.std(leaf),
                jnp.min(leaf),
                jnp.max(leaf),
            ]
        )
    return out


class ExperimentMonitor:
    STAT_COLUMNS = ("l2", "mean", "std", "min", "max")

    def __init__(self, config: MonitorConfig, output_path: str) -> None:
        self.config = config
        self.storage = MonitorStorage(
            f"{output_path}/monitor_data.h5",
            buffer_size=config.buffer_size,
            compression=config.compression,
            compression_opts=config.compression_opts,
        )
        self.epoch = 0
        self.global_step = 0
        patterns = list(config.exclude_layers or DEFAULT_EXCLUDE)
        self._exclude = [re.compile(p) for p in patterns]
        self._include = [re.compile(p) for p in (config.include_layers or [])]

    def _keep(self, name: str) -> bool:
        if self._include:
            return any(p.search(name) for p in self._include)
        return not any(p.search(name) for p in self._exclude)

    # -- lifecycle ------------------------------------------------------------

    def start_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def step(self) -> None:
        self.global_step += 1

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
        host = jax.device_get(tree_stats(params))
        for name, s in host.items():
            if not self._keep(name):
                continue
            self.storage.append(
                "weights",
                f"epoch_{self.epoch}/{name}",
                np.asarray(s),
                {"columns": ",".join(self.STAT_COLUMNS)},
            )
        if self.config.enable_layer_convergence:
            # convergence proxy: per-layer weight L2 trajectory
            l2 = np.asarray([host[k][0] for k in sorted(host)])
            self.storage.append(
                "convergence", f"epoch_{self.epoch}/weight_l2", l2,
                {"layers": ";".join(sorted(host))},
            )
