from mmtpu.config.base import BaseConfig
from mmtpu.config.cmam import AssociationNetworkConfig, CMAMConfig
from mmtpu.config.data import (
    DataConfig,
    DatasetConfig,
    MissingPatternConfig,
    ModalityConfig,
)
from mmtpu.config.experiment import ExperimentConfig
from mmtpu.config.logging_ import LoggingConfig
from mmtpu.config.metrics import MetricConfig, MetricDef
from mmtpu.config.model import ModelConfig
from mmtpu.config.monitor import MonitorConfig
from mmtpu.config.optim import OptimizerConfig, ParameterGroupConfig
from mmtpu.config.spec import ModuleSpec, build_specs, is_spec
from mmtpu.config.training import StandardMultimodalConfig, TrainingConfig

import mmtpu.config.yaml_tags  # noqa: F401  — registers YAML tags on import

__all__ = [
    "BaseConfig",
    "AssociationNetworkConfig",
    "CMAMConfig",
    "DataConfig",
    "DatasetConfig",
    "MissingPatternConfig",
    "ModalityConfig",
    "ExperimentConfig",
    "LoggingConfig",
    "MetricConfig",
    "MetricDef",
    "ModelConfig",
    "MonitorConfig",
    "OptimizerConfig",
    "ParameterGroupConfig",
    "ModuleSpec",
    "build_specs",
    "is_spec",
    "StandardMultimodalConfig",
    "TrainingConfig",
]
