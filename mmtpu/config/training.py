"""TrainingConfig + the top-level StandardMultimodalConfig.

Reference: config/multimodal_training_config.py:34-351. `load()` parses the
YAML (tags are spec-producing, see mmtpu/config/yaml_tags.py), wires the
run_id into path templating and global state, and validates components.

Optimizer/scheduler construction is deferred to mmtpu/train/optim.py (optax
transforms + host-side LR controllers) — the functional counterpart of the
reference's `get_optimizer`/`get_scheduler`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

from mmtpu.config.base import BaseConfig
from mmtpu.config.data import DataConfig
from mmtpu.config.experiment import ExperimentConfig
from mmtpu.config.logging_ import LoggingConfig
from mmtpu.config.metrics import MetricConfig
from mmtpu.config.model import ModelConfig
from mmtpu.config.monitor import MonitorConfig
from mmtpu.config.optim import OptimizerConfig
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.utils import global_state
from mmtpu.utils.logging import get_logger
from mmtpu.utils.utils import format_path_with_env

logger = get_logger()


@dataclass
class TrainingConfig(BaseConfig):
    epochs: int
    num_modalities: int
    optimizer: OptimizerConfig
    loss_functions: LossFunctionGroup
    scheduler: Optional[str] = None
    scheduler_args: Dict[str, Any] = field(default_factory=dict)
    validation_interval: int = 1
    missing_rates: Optional[List[float]] = None
    do_validation_visualization: bool = False
    early_stopping: bool = False
    early_stopping_patience: int = 10
    early_stopping_min_delta: float = 0.001
    encoder_optimizer: Optional[OptimizerConfig] = None
    modality_specific_params: Optional[Dict[str, Dict[str, Any]]] = None

    @classmethod
    def from_dict(cls, data: Dict[str, Any], **extra: Any) -> "TrainingConfig":
        data = {**data, **extra}
        # YAML uses `scheduler_kwargs`; accept both spellings like the
        # reference's permissive from_dict.
        if "scheduler_kwargs" in data and "scheduler_args" not in data:
            data["scheduler_args"] = data.pop("scheduler_kwargs")
        if not isinstance(data.get("optimizer"), OptimizerConfig):
            data["optimizer"] = OptimizerConfig.from_dict(data["optimizer"])
        if data.get("encoder_optimizer") is not None and not isinstance(
            data["encoder_optimizer"], OptimizerConfig
        ):
            data["encoder_optimizer"] = OptimizerConfig.from_dict(
                data["encoder_optimizer"]
            )
        if not isinstance(data.get("loss_functions"), LossFunctionGroup):
            data["loss_functions"] = LossFunctionGroup.from_dict(
                data.get("loss_functions") or {}
            )
        return super().from_dict(data)

    def __post_init__(self) -> None:
        if self.num_modalities < 1:
            raise ValueError("num_modalities must be >= 1")
        if self.missing_rates is not None:
            if len(self.missing_rates) != self.num_modalities:
                raise ValueError(
                    f"{len(self.missing_rates)} missing rates for "
                    f"{self.num_modalities} modalities"
                )
            if not all(0.0 <= r <= 1.0 for r in self.missing_rates):
                raise ValueError("missing rates must be in [0,1]")
        else:
            self.missing_rates = [0.0] * self.num_modalities


@dataclass
class StandardMultimodalConfig(BaseConfig):
    experiment: ExperimentConfig
    data: DataConfig
    model: ModelConfig
    logging: LoggingConfig
    metrics: MetricConfig
    training: TrainingConfig
    monitoring: MonitorConfig = field(default_factory=MonitorConfig)
    _config_path: Optional[str] = None

    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def __setitem__(self, key: str, value: Any) -> None:
        setattr(self, key, value)

    @classmethod
    def load(cls, path, run_id: int) -> "StandardMultimodalConfig":
        """Parse YAML with the mmtpu tag registry and assemble the config."""
        import mmtpu.config.yaml_tags  # noqa: F401  (registers tags)

        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls.from_parsed(raw, run_id=run_id, config_path=str(path))

    @classmethod
    def from_parsed(
        cls, raw: Dict[str, Any], run_id: int, config_path: Optional[str] = None
    ) -> "StandardMultimodalConfig":
        exp_data = raw["experiment"]
        if isinstance(exp_data, ExperimentConfig):
            experiment = exp_data
            experiment.run_id = run_id
        else:
            experiment = ExperimentConfig.from_dict({**exp_data, "run_id": run_id})

        global_state.set_run_id(run_id)
        global_state.set_experiment_name(experiment.name)

        logging_cfg = raw["logging"]
        if not isinstance(logging_cfg, LoggingConfig):
            logging_cfg = LoggingConfig.from_dict(
                logging_cfg, experiment_name=experiment.name, run_id=run_id
            )
        else:
            logging_cfg.experiment_name = experiment.name
            logging_cfg.run_id = run_id
            logging_cfg._process_paths()

        model_cfg = raw["model"]
        if not isinstance(model_cfg, ModelConfig):
            model_cfg = ModelConfig.from_dict(model_cfg)
        if model_cfg.pretrained_path is not None:
            model_cfg.pretrained_path = logging_cfg.format_path(
                format_path_with_env(model_cfg.pretrained_path)
            )
            # DELIBERATE deviation: the reference validates pretrained_path
            # existence at load (multimodal_training_config.py:320, raising
            # if the artifact is absent). mmtpu defers the existence check
            # to restore time so every reference YAML loads without its
            # training artifacts present (the corpus-load guarantee,
            # tests/test_config.py); ModelConfig.validate_config remains
            # available for callers that want the reference's fail-fast.

        data_cfg = raw["data"]
        if not isinstance(data_cfg, DataConfig):
            data_cfg = DataConfig.from_dict(data_cfg)

        training_cfg = raw["training"]
        if not isinstance(training_cfg, TrainingConfig):
            training_cfg = TrainingConfig.from_dict(training_cfg)

        metrics_cfg = raw["metrics"]
        if not isinstance(metrics_cfg, MetricConfig):
            metrics_cfg = MetricConfig.from_dict(metrics_cfg)

        monitoring_cfg = raw.get("monitoring") or {}
        if not isinstance(monitoring_cfg, MonitorConfig):
            monitoring_cfg = MonitorConfig.from_dict(monitoring_cfg)

        cfg = cls(
            experiment=experiment,
            data=data_cfg,
            model=model_cfg,
            logging=logging_cfg,
            metrics=metrics_cfg,
            training=training_cfg,
            monitoring=monitoring_cfg,
            _config_path=config_path,
        )
        logger.info(f"Loaded configuration from {config_path}")
        return cfg

    def save(self, path: str | Path) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, default_flow_style=False)

    def to_dict(self) -> Dict[str, Any]:
        def _plain(obj: Any) -> Any:
            if hasattr(obj, "to_dict"):
                return _plain(obj.to_dict())
            if isinstance(obj, dict):
                return {str(k): _plain(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [_plain(v) for v in obj]
            if isinstance(obj, str):
                return str(obj)  # Modality is a str subclass SafeDumper rejects
            if isinstance(obj, (int, float, bool)) or obj is None:
                return obj
            return repr(obj)

        return {
            "experiment": _plain(self.experiment.to_dict()),
            "data": _plain(self.data),
            "model": _plain(self.model.to_dict()),
            "logging": _plain(self.logging),
            "metrics": _plain(self.metrics),
            "training": _plain(self.training),
            "monitoring": _plain(self.monitoring),
        }
