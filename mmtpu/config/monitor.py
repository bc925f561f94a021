"""Monitoring toggles + intervals (reference: config/monitor_config.py:8-35).

Field-parity note: `weight_interval` and `enable_information_flow` are
accepted-but-unread IN THE REFERENCE TOO — its monitor tracks weights every
epoch whenever `enable_weight_tracking` is set (monitor.py:163-167) and
never reads either field. They are kept here so reference configs load
unchanged; setting them has no effect in either framework."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from mmtpu.config.base import BaseConfig


@dataclass
class MonitorConfig(BaseConfig):
    enabled: bool = False
    gradient_interval: int = 100
    activation_interval: int = 100
    weight_interval: int = 200
    buffer_size: int = 1000
    flush_interval: int = 100
    compression: Optional[str] = "gzip"
    compression_opts: int = 4
    enable_gradient_tracking: bool = True
    enable_activation_tracking: bool = True
    enable_weight_tracking: bool = True
    enable_layer_convergence: bool = True
    enable_information_flow: bool = False
    include_layers: Optional[list] = None
    exclude_layers: Optional[list] = None
