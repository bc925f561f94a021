"""ModuleSpec — the deferred-construction record behind every model YAML tag.

Design inversion vs the reference (SURVEY.md §5.6): reference YAML tags like
`!ResNet18` instantiate live `nn.Module`s (with parameters) *during parsing*
(config/yaml_constructors.py:37-43). Here the same tags produce a pure
``ModuleSpec(name, kwargs)``; Flax modules are built after config
validation, and parameters are initialized under an explicit PRNG key —
reproducible and sharding-aware.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict


@dataclasses.dataclass
class ModuleSpec:
    """A deferred module constructor: registry name + constructor kwargs."""

    name: str
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def build(self) -> Any:
        """Instantiate the Flax module (stateless definition, no params)."""
        from mmtpu.models.registry import build_module

        return build_module(self.name, **self.kwargs)

    def to_dict(self) -> Dict[str, Any]:
        return {"__module_spec__": self.name, **self.kwargs}

    def __repr__(self) -> str:  # noqa: D105
        return f"ModuleSpec({self.name!r}, {self.kwargs!r})"


def is_spec(obj: Any) -> bool:
    return isinstance(obj, ModuleSpec)


def build_specs(obj: Any) -> Any:
    """Recursively replace ModuleSpecs with built Flax modules."""
    if isinstance(obj, ModuleSpec):
        return obj.build()
    if isinstance(obj, dict):
        return {k: build_specs(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(build_specs(v) for v in obj)
    return obj
