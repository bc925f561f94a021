"""Modality registry and missing-mask synthesis.

Replaces the reference's external `modalities` git dependency (used at
reference MML_Suite/data/base_dataset.py:9 and train_multimodal.py:37,70):
a string-valued Modality enum-like registry plus `create_missing_mask`.

Masks are generated host-side with NumPy (seeded) and applied on device as a
cheap elementwise multiply — the TPU-native equivalent of the reference's
per-sample tensor masking.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


class Modality(str):
    """A named modality. Behaves as its lowercase string name.

    ``str(Modality.AUDIO) == "audio"`` so batch keys like
    ``f"{mod}_original"`` render as ``"audio_original"`` — matching the
    reference's batch schema.
    """

    _registry: Dict[str, "Modality"] = {}

    def __new__(cls, name) -> "Modality":
        # tolerate non-str inputs (e.g. int-enum values in reference pickles)
        key = str(name).lower()
        if key in cls._registry:
            return cls._registry[key]
        obj = super().__new__(cls, key)
        cls._registry[key] = obj
        return obj

    @property
    def name(self) -> str:  # enum-like accessor
        return str(self).upper()

    @classmethod
    def from_str(cls, name: str) -> "Modality":
        key = name.lower()
        if key not in cls._registry:
            raise ValueError(
                f"Unknown modality: {name!r}. Registered: {sorted(cls._registry)}"
            )
        return cls._registry[key]

    def __repr__(self) -> str:  # noqa: D105
        return f"Modality.{self.name}"


def add_modality(name: str) -> Modality:
    """Register (or fetch) a modality by name. YAML `!Modality` hook."""
    return Modality(name)


# Built-in modalities (reference registers these via its `modalities` dep).
Modality.AUDIO = add_modality("audio")
Modality.IMAGE = add_modality("image")
Modality.TEXT = add_modality("text")
Modality.VIDEO = add_modality("video")
Modality.MULTIMODAL = add_modality("multimodal")


def create_missing_mask(
    num_modalities: int,
    length: int,
    keep_probs: Sequence[float],
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Bernoulli keep-masks: shape (length, num_modalities) of {0., 1.}.

    ``keep_probs[m]`` is the probability modality ``m`` is KEPT
    (reference semantics: keep prob = 1 - missing_rate; modalities absent
    from a pattern get keep prob 0.0 → always masked).
    """
    if len(keep_probs) != num_modalities:
        raise ValueError(
            f"keep_probs has {len(keep_probs)} entries for {num_modalities} modalities"
        )
    rng = rng if rng is not None else np.random.default_rng()
    probs = np.asarray(keep_probs, dtype=np.float32)
    # Degenerate probs avoid RNG draws entirely for determinism.
    u = rng.random((length, num_modalities), dtype=np.float32)
    return (u < probs[None, :]).astype(np.float32)


def modality_initials(mods: Sequence[str]) -> str:
    """Canonical pattern name: sorted first letters (e.g. audio+image → 'ai')."""
    return "".join(sorted(str(m)[0] for m in mods))
