"""CMAM experiment config (reference: config/cmam_config.py:29-139).

Adds a second ModelConfig (`cmam`) for the cross-modal association network
alongside the base multimodal model config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import yaml

from mmtpu.config.base import BaseConfig
from mmtpu.config.model import ModelConfig
from mmtpu.config.training import StandardMultimodalConfig


@dataclass(kw_only=True)
class AssociationNetworkConfig(BaseConfig):
    input_size: int
    hidden_size: int
    output_size: int
    batch_norm: bool = False
    dropout: float = 0.0


@dataclass
class CMAMConfig(StandardMultimodalConfig):
    cmam: Optional[ModelConfig] = None
    target_modality: Optional[str] = None

    @classmethod
    def load(cls, path, run_id: int) -> "CMAMConfig":
        import mmtpu.config.yaml_tags  # noqa: F401

        with open(path) as f:
            raw = yaml.safe_load(f)
        base = StandardMultimodalConfig.from_parsed(
            raw, run_id=run_id, config_path=str(path)
        )
        cmam_cfg = raw["cmam"]
        if not isinstance(cmam_cfg, ModelConfig):
            cmam_cfg = ModelConfig.from_dict(cmam_cfg)
        return cls(
            experiment=base.experiment,
            data=base.data,
            model=base.model,
            logging=base.logging,
            metrics=base.metrics,
            training=base.training,
            monitoring=base.monitoring,
            _config_path=base._config_path,
            cmam=cmam_cfg,
            target_modality=raw.get("target_modality"),
        )

    def to_dict(self) -> Dict[str, Any]:
        out = super().to_dict()
        if self.cmam is not None:
            out["cmam"] = self.cmam.to_dict()
        out["target_modality"] = str(self.target_modality)
        return out
