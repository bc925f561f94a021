"""Optimizer configuration with regex-scoped parameter groups.

Reference: config/optimizer_config.py — optimizer name + `default_kwargs` +
`parameter_groups` whose regex `pattern`s partition params with per-group
lr/weight-decay; overlap between groups is an error (:107-135).

TPU-native realization: optax transforms assembled by
mmtpu/train/optim.py — groups become an `optax.multi_transform` keyed by a
path-regex labeling of the param pytree; learning rates are injected
hyperparams so host-side schedulers (plateau etc.) can update them without
recompilation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from mmtpu.config.base import BaseConfig


@dataclass
class ParameterGroupConfig(BaseConfig):
    pattern: str
    lr: Optional[float] = None
    weight_decay: Optional[float] = None
    kwargs: Dict[str, Any] = field(default_factory=dict)

    def matches(self, param_path: str) -> bool:
        return re.search(self.pattern, param_path) is not None

    def effective_kwargs(self, defaults: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(defaults)
        if self.lr is not None:
            out["lr"] = self.lr
        if self.weight_decay is not None:
            out["weight_decay"] = self.weight_decay
        out.update(self.kwargs)
        return out


@dataclass
class OptimizerConfig(BaseConfig):
    name: str
    default_kwargs: Dict[str, Any] = field(default_factory=dict)
    parameter_groups: List[ParameterGroupConfig] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.parameter_groups = [
            g if isinstance(g, ParameterGroupConfig) else ParameterGroupConfig.from_dict(g)
            for g in (self.parameter_groups or [])
        ]

    def validate_no_overlap(self, param_paths: List[str]) -> None:
        """Reject param paths matched by more than one group."""
        seen: Dict[str, str] = {}
        for group in self.parameter_groups:
            for path in param_paths:
                if group.matches(path):
                    if path in seen:
                        raise ValueError(
                            f"Parameter {path!r} matched by both "
                            f"{seen[path]!r} and {group.pattern!r}"
                        )
                    seen[path] = group.pattern
