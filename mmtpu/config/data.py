"""Data configuration: missing-pattern synthesis + dataset/pipeline builders.

Reference semantics (config/data_config.py):
- `ModalityConfig.missing_rate` with optional `apply_to` pattern scoping —
  the rate only applies to patterns listed in `apply_to` (:33-38).
- `MissingPatternConfig.generate_patterns` (:58-106): powerset of modalities
  (excluding empty set); per-pattern keep-probabilities — modality present in
  pattern → 1.0 (or 1-rate when scoped), absent → 0.0. Pattern names are
  sorted first letters ("ai", "atv", ...).
- `DatasetConfig` → dataset instance; `DataConfig.build_all_dataloaders`.

TPU-native: datasets here are host-side numpy pipelines emitting fixed-shape
batches (see mmtpu/data/), not torch DataLoaders.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field
from itertools import chain, combinations
from typing import Any, Dict, List, Optional, Set

from mmtpu.config.base import BaseConfig
from mmtpu.modalities import Modality
from mmtpu.utils.logging import get_logger
from mmtpu.utils.utils import format_path_with_env

logger = get_logger()


@dataclass
class ModalityConfig(BaseConfig):
    """Missing rate for one modality, optionally scoped to patterns."""

    missing_rate: float = 0.0
    apply_to: Optional[List[str]] = None

    def __post_init__(self) -> None:
        if not 0.0 <= self.missing_rate <= 1.0:
            raise ValueError(f"missing_rate must be in [0,1], got {self.missing_rate}")

    def should_apply_to(self, pattern: str) -> bool:
        # Reference quirk preserved: no apply_to list → never applies
        # (config/data_config.py:33-38).
        return self.apply_to is not None and pattern in self.apply_to


@dataclass
class MissingPatternConfig(BaseConfig):
    modalities: Dict[Modality, ModalityConfig] = field(default_factory=OrderedDict)
    selected_patterns: Optional[List[str]] = None

    def __post_init__(self) -> None:
        if self.selected_patterns:
            self.selected_patterns = ["".join(sorted(p)) for p in self.selected_patterns]
        # Coerce plain-dict entries (when parsed without tags).
        self.modalities = OrderedDict(
            (
                Modality(str(k)),
                v if isinstance(v, ModalityConfig) else ModalityConfig.from_dict(v or {}),
            )
            for k, v in self.modalities.items()
        )

    @property
    def available_modalities(self) -> Set[str]:
        return {str(m) for m in self.modalities} | {"multimodal"}

    def generate_patterns(self) -> Dict[str, Dict[Modality, float]]:
        """Pattern name → {modality: keep probability}."""
        mods = sorted(self.modalities.keys())
        combos = list(
            chain.from_iterable(combinations(mods, r) for r in range(1, len(mods) + 1))
        )
        combos.sort(key=lambda c: (len(c), c))

        patterns: Dict[str, Dict[Modality, float]] = {}
        for combo in combos:
            name = "".join(sorted(str(m)[0] for m in combo))
            probs: Dict[Modality, float] = {}
            for m in mods:
                if m in combo:
                    if self.modalities[m].should_apply_to(name):
                        probs[m] = round(1.0 - self.modalities[m].missing_rate, 4)
                    else:
                        probs[m] = 1.0
                else:
                    probs[m] = 0.0
            patterns[name] = probs

        # The full pattern always carries each modality's configured rate
        # (reference :94-100 overwrites it with 1-rate per modality).
        full_name = "".join(sorted(str(m)[0] for m in mods))
        patterns[full_name] = {
            m: round(1.0 - self.modalities[m].missing_rate, 4) for m in mods
        }

        if self.selected_patterns:
            patterns = {
                k: v for k, v in patterns.items() if k in self.selected_patterns
            }
        return patterns


@dataclass
class DatasetConfig(BaseConfig):
    dataset: str
    data_fp: str
    target_modality: Any = Modality.MULTIMODAL
    split: str = "train"
    batch_size: int = 32
    shuffle: bool = False
    pin_memory: bool = False
    drop_last: bool = False
    num_workers: int = 0
    selected_missing_types: Optional[List[str]] = None
    kwargs: Dict[str, Any] = field(default_factory=dict)
    missing_patterns: Optional[MissingPatternConfig] = None

    @classmethod
    def from_dict(cls, data: Dict[str, Any], **extra: Any) -> "DatasetConfig":
        import dataclasses as _dc

        data = {**data, **extra}
        names = {f.name for f in _dc.fields(cls)}
        known = {k: v for k, v in data.items() if k in names}
        unknown = {k: v for k, v in data.items() if k not in names}
        known.setdefault("kwargs", {})
        known["kwargs"] = {**unknown, **known["kwargs"]}
        return cls(**known)

    def __post_init__(self) -> None:
        self.data_fp = format_path_with_env(self.data_fp)
        if isinstance(self.target_modality, str):
            self.target_modality = Modality(self.target_modality)
        if self.missing_patterns is None:
            self.missing_patterns = MissingPatternConfig()
        elif not isinstance(self.missing_patterns, MissingPatternConfig):
            self.missing_patterns = MissingPatternConfig.from_dict(self.missing_patterns)

    def get_dataset_args(self) -> Dict[str, Any]:
        args: Dict[str, Any] = {
            "data_fp": self.data_fp,
            "split": self.split,
            "target_modality": self.target_modality,
        }
        if self.missing_patterns is not None:
            args["missing_patterns"] = self.missing_patterns.generate_patterns()
            args["selected_patterns"] = self.missing_patterns.selected_patterns
        args.update(self.kwargs)
        return args

    def build_dataset(self, seed: int = 0):
        from mmtpu.data import resolve_dataset_name

        cls = resolve_dataset_name(self.dataset)
        args = self.get_dataset_args()
        return cls(seed=seed, **args)


@dataclass
class DataConfig(BaseConfig):
    datasets: Dict[str, DatasetConfig]
    default_batch_size: int = 32
    use_collate_fn: bool = False

    def __post_init__(self) -> None:
        if not self.datasets:
            raise ValueError("No datasets configured")
        for name, cfg in list(self.datasets.items()):
            if not isinstance(cfg, DatasetConfig):
                self.datasets[name] = DatasetConfig.from_dict(cfg)

    def build_loader(self, split: str, seed: int = 0):
        from mmtpu.data.loader import build_loader

        if split not in self.datasets:
            raise KeyError(f"Split {split!r} not configured")
        cfg = self.datasets[split]
        dataset = cfg.build_dataset(seed=seed)
        return build_loader(
            dataset,
            batch_size=cfg.batch_size or self.default_batch_size,
            shuffle=cfg.shuffle,
            drop_last=cfg.drop_last,
            seed=seed,
        )

    def build_all_loaders(
        self, is_train: bool = True, is_test: bool = True, seed: int = 0
    ) -> Dict[str, Any]:
        loaders: Dict[str, Any] = {}
        for split in self.datasets:
            if split in ("train", "trn", "validation") and not is_train:
                continue
            if split == "test" and not is_test:
                continue
            loaders[split] = self.build_loader(split, seed=seed)
        return loaders
