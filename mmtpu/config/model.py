"""Model configuration (reference: config/model_config.py:19-199).

Identical funnel semantics: every YAML key that is not a declared field ends
up in `kwargs` and becomes a model constructor argument
(model_config.py:123-145). Encoder values arrive as ModuleSpecs (via YAML
tags) and are built into Flax modules at model-construction time.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

from mmtpu.config.base import BaseConfig
from mmtpu.utils.logging import get_logger
from mmtpu.utils.utils import SafeDict

logger = get_logger()


@dataclass
class ModelConfig(BaseConfig):
    name: str
    model_type: str
    pretrained_path: Optional[str] = None
    pretrained_encoders: Optional[Dict[str, str]] = None
    init_fn: Optional[str] = None
    kwargs: Dict[str, Any] = field(default_factory=dict)
    version: str = "1.0.0"

    @classmethod
    def from_dict(cls, data: Dict[str, Any], **extra: Any) -> "ModelConfig":
        data = {**data, **extra}
        names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in data.items() if k in names}
        unknown = {k: v for k, v in data.items() if k not in names}
        known.setdefault("kwargs", {})
        known["kwargs"] = {**unknown, **known["kwargs"]}
        return cls(**known)

    def format_path(self, path: str, run_id: int) -> Optional[Path]:
        if not path:
            return None
        return Path(str(path).format_map(SafeDict(run_id=run_id)))

    def validate_config(self, run_id: int = 1) -> None:
        if self.pretrained_path is not None:
            from mmtpu.checkpoints.manager import resolve_checkpoint_path

            path = resolve_checkpoint_path(
                self.format_path(str(self.pretrained_path), run_id)
            )
            if not path.exists():
                raise FileNotFoundError(f"Pretrained path not found: {path}")
            self.pretrained_path = str(path.resolve())

    def get_param(self, param: str, default: Any = None) -> Any:
        if param in {"name", "model_type", "pretrained_path", "version"}:
            return getattr(self, param)
        return self.kwargs.get(param, default)

    def update_kwargs(self, **kwargs: Any) -> None:
        self.kwargs.update(kwargs)

    def to_dict(self) -> Dict[str, Any]:
        base = {
            "name": self.name,
            "model_type": self.model_type,
            "init_fn": self.init_fn,
            "version": self.version,
        }
        if self.pretrained_path:
            base["pretrained_path"] = self.pretrained_path
        if self.pretrained_encoders:
            base["pretrained_encoders"] = self.pretrained_encoders
        base.update(self.kwargs)
        return base
