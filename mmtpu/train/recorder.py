"""MetricRecorder — per-(group, pattern) accumulation, epoch-end compute.

Reference: experiment_utils/metric_recorder.py:67-497. Same public surface
(`update_group`, `update_group_all`, `calculate_metrics_for_group`,
`calculate_all_groups`, `reset`) and the same result-key naming
``{metric}[_{subkey}]_{PATTERN}`` with the pattern upper-cased and 'z'
stripped (:194).

TPU-native accumulation (SURVEY.md §7 hard-part 1): update_* accepts device
arrays plus an integer pattern-id vector and STORES THEM UNTOUCHED — no
device→host sync in the hot loop. The single bulk `jax.device_get` happens
in `calculate_*` at epoch end, after which batches are split by pattern on
host and fed to the exact sklearn functions the config names.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from mmtpu.config.metrics import MetricConfig
from mmtpu.utils.logging import get_logger

logger = get_logger()


class MetricRecorder:
    def __init__(
        self,
        config: MetricConfig,
        tensorboard_path: Optional[str] = None,
        tb_record_only: Optional[List[str]] = None,
    ) -> None:
        self.config = config
        self.metrics: Dict[str, Callable] = {
            name: mdef.load() for name, mdef in config.metrics.items()
        }
        self.metric_kwargs: Dict[str, Dict[str, Any]] = {
            name: mdef.kwargs for name, mdef in config.metrics.items()
        }
        # group → pattern-name → list[(preds, targets)] (possibly device arrays)
        self.group_data: Dict[str, Dict[str, List]] = defaultdict(
            lambda: defaultdict(list)
        )
        # group → list[(preds, targets, pattern_ids, vocab, mask)] — deferred split
        self._deferred: Dict[str, List] = defaultdict(list)
        self.current_results: Dict[str, Dict[str, float]] = {}
        self.tb_record_only = tb_record_only
        self.writer = None
        if tensorboard_path:
            try:
                # pure-Python event writer — keeps torch out of the training
                # runtime (torch remains only in checkpoints/torch_interop)
                from mmtpu.utils.tb_writer import SummaryWriter

                self.writer = SummaryWriter(log_dir=str(tensorboard_path))
            except Exception as e:  # pragma: no cover
                logger.warning(f"TensorBoard writer unavailable: {e}")

    # -- accumulation -------------------------------------------------------

    def update_group(self, group_name, predictions, targets, modality) -> None:
        if group_name not in self.config.groups:
            raise ValueError(f"Unknown metric group: {group_name}")
        # fail at update time like the reference (:121-122) — a shape
        # mismatch caught here names the offending step; caught at epoch-end
        # concatenation it would cost the whole epoch's metrics
        p_shape = np.shape(predictions)
        t_shape = np.shape(targets)
        if p_shape != t_shape:
            raise ValueError(
                f"Shape mismatch between predictions {p_shape} "
                f"and targets {t_shape}"
            )
        self.group_data[group_name][str(modality)].append((predictions, targets))

    def update_group_all(self, group_name, predictions, targets, m_types) -> None:
        """Split a host batch by its per-sample pattern labels (strings)."""
        m_types = np.asarray(m_types)
        predictions = np.asarray(predictions)
        targets = np.asarray(targets)
        for m_type in np.unique(m_types):
            mask = m_types == m_type
            self.update_group(group_name, predictions[mask], targets[mask], m_type)

    def update_group_ids(
        self,
        group_name: str,
        predictions,
        targets,
        pattern_ids,
        vocab: Sequence[str],
        sample_mask=None,
    ) -> None:
        """Device-friendly path: store (still-async) device arrays; the
        pattern split happens on host at epoch end."""
        if group_name not in self.config.groups:
            raise ValueError(f"Unknown metric group: {group_name}")
        self._deferred[group_name].append(
            (predictions, targets, pattern_ids, tuple(vocab), sample_mask)
        )

    def _materialize(self) -> None:
        """One bulk device→host transfer, then split deferred data."""
        import jax

        if not self._deferred:
            return
        for group, items in self._deferred.items():
            host = jax.device_get(
                [(p, t, ids, m) for p, t, ids, _v, m in items]
            )
            for (preds, targets, ids, mask), (_, _, _, vocab, _) in zip(host, items):
                preds = np.asarray(preds)
                targets = np.asarray(targets)
                ids = np.asarray(ids)
                if mask is not None:
                    keep = np.asarray(mask).astype(bool)
                    preds, targets, ids = preds[keep], targets[keep], ids[keep]
                for pid in np.unique(ids):
                    sel = ids == pid
                    self.group_data[group][vocab[int(pid)]].append(
                        (preds[sel], targets[sel])
                    )
        self._deferred.clear()

    # -- computation ----------------------------------------------------------

    def calculate_metrics_for_group(
        self,
        group_name: str,
        epoch: Optional[int] = None,
        loss: Optional[float] = None,
        skip_tensorboard: bool = False,
    ) -> Dict[str, Any]:
        if group_name not in self.config.groups:
            raise ValueError(f"Unknown metric group: {group_name}")
        self._materialize()

        group_metrics = self.config.get_group_metrics(group_name)
        results: Dict[str, Any] = {"loss": loss} if loss is not None else {}

        for modality, data in self.group_data[group_name].items():
            if not data:
                continue
            try:
                all_preds = np.concatenate(
                    [np.asarray(p) for p, _ in data], axis=0
                )
                all_targets = np.concatenate(
                    [np.asarray(t) for _, t in data], axis=0
                )
            except ValueError as e:  # reference :179-184 — skip, don't abort
                logger.error(
                    f"Error concatenating data for modality {modality}: {e}"
                )
                continue
            # Reference key naming (:194): upper-case, strip 'z'.
            pattern_key = modality.replace("z", "").upper() if modality else ""

            for metric_name in group_metrics:
                fn = self.metrics[metric_name]
                kwargs = self.metric_kwargs.get(metric_name, {})
                try:
                    value = fn(all_targets, all_preds, **kwargs)
                except Exception as e:
                    logger.error(f"Metric {metric_name} failed: {e}")
                    continue
                if isinstance(value, dict):
                    for k, v in value.items():
                        results[f"{metric_name}_{k}_{pattern_key}"] = v
                else:
                    if isinstance(value, np.ndarray):
                        value = value.tolist()
                    results[f"{metric_name}_{pattern_key}"] = value

        if self.writer and not skip_tensorboard:
            self._log_tensorboard(results, group_name, epoch)
        self.current_results[group_name] = results
        return results

    def calculate_all_groups(
        self,
        epoch: Optional[int] = None,
        loss: Optional[float] = None,
        skip_tensorboard: bool = False,
    ) -> Dict[str, Dict[str, Any]]:
        return {
            group: self.calculate_metrics_for_group(
                group, epoch=epoch, loss=loss, skip_tensorboard=skip_tensorboard
            )
            for group in self.config.groups
        }

    def reset(self) -> None:
        self.group_data.clear()
        self._deferred.clear()
        self.current_results.clear()  # reference reset() clears it too (:275)

    # -- tensorboard -----------------------------------------------------------

    def _log_tensorboard(self, results, group_name, epoch) -> None:
        # Reference parity (_log_to_tensorboard :236-259): keys containing
        # 'loss' are excluded (the driver logs its own loss scalars),
        # tb_record_only patterns are ANCHORED (re.match), and tags are
        # '{group}_{key}'.
        import re

        for key, value in results.items():
            if isinstance(value, (list, dict)):
                continue
            if "loss" in key:
                continue
            if self.tb_record_only and not any(
                re.match(p, key) for p in self.tb_record_only
            ):
                continue
            try:
                self.writer.add_scalar(
                    f"{group_name}_{key}", float(value), epoch or 0
                )
            except Exception:  # non-scalar metric values
                pass

    def close(self) -> None:
        if self.writer:
            self.writer.close()
