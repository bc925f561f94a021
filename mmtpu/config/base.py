"""Dataclass config base (reference: config/base_config.py:11-74)."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Type, TypeVar

import yaml

T = TypeVar("T", bound="BaseConfig")


@dataclasses.dataclass
class BaseConfig:
    """from_dict / to_dict / from_yaml / get for all config dataclasses."""

    @classmethod
    def from_dict(cls: Type[T], data: Dict[str, Any], **extra: Any) -> T:
        if isinstance(data, cls):
            return data
        merged = {**data, **extra}
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in merged.items() if k in names})

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, BaseConfig):
                v = v.to_dict()
            out[f.name] = v
        return out

    @classmethod
    def from_yaml(cls: Type[T], path: str | Path) -> T:
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)
