"""AVMNIST dataset: CSV-indexed spectrograms + MNIST images.

Reference: data/avmnist.py:21-277. Sample pipeline reproduced exactly:
- audio: torch-saved spectrogram `.pt` tensors, float32 (32, 94),
- image: torch-saved uint8 (28, 28) → gist_earth colormap LUT → PIL 'L'
  grayscale luma → float32 / 255 (reference :177-191; here as a precomputed
  256-entry LUT, bit-identical to the PIL path),
- patterns over {audio, image} ("ai"/"a"/"i"), 10 classes.

TPU-native inversion: instead of per-__getitem__ torch.load + PIL, the whole
split is decoded once into contiguous float32 arrays and cached as raw .npy
sidecars next to the CSV, then memory-mapped — the hot loop slices numpy
(pages fault in on demand, like the reference's lazy per-sample torch.load
at data/avmnist.py:164,218-221 but without Python file IO per sample), and
building the dataset object costs no bulk read at all (config validation,
--dry-run, and CLI startup stay O(index)).
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import List, Optional

import numpy as np

from mmtpu.data.base import MultimodalArrayDataset
from mmtpu.modalities import Modality
from mmtpu.utils.logging import get_logger

logger = get_logger()

AUDIO_SHAPE = (32, 94)
IMAGE_SHAPE = (28, 28)


def _gist_earth_luma_lut() -> np.ndarray:
    """256-entry LUT: uint8 pixel → PIL-'L' luma of gist_earth(pixel).

    Matches reference data/avmnist.py:188-191: uint8 arrays index the
    colormap LUT directly; PIL 'L' = (R*299 + G*587 + B*114) / 1000.
    """
    from matplotlib import cm

    rgba = (cm.gist_earth(np.arange(256)) * 255).astype(np.uint8)
    r, g, b = rgba[:, 0].astype(np.uint32), rgba[:, 1].astype(np.uint32), rgba[:, 2].astype(np.uint32)
    luma = (r * 299 + g * 587 + b * 114) // 1000
    return luma.astype(np.uint8)


class AVMNIST(MultimodalArrayDataset):
    NUM_CLASSES = 10
    AVAILABLE_MODALITIES = {"audio": Modality.AUDIO, "image": Modality.IMAGE}

    def __init__(
        self,
        data_fp,
        split: str,
        target_modality=Modality.MULTIMODAL,
        *,
        missing_patterns=None,
        selected_patterns: Optional[List[str]] = None,
        audio_column: str = "audio",
        image_column: str = "image",
        labels_column: str = "label",
        seed: int = 0,
        **_unused,
    ) -> None:
        m_patterns = missing_patterns or {
            "ai": {Modality.AUDIO: 1.0, Modality.IMAGE: 1.0},
            "a": {Modality.AUDIO: 1.0, Modality.IMAGE: 0.0},
            "i": {Modality.AUDIO: 0.0, Modality.IMAGE: 1.0},
        }
        super().__init__(
            split=split,
            missing_patterns=m_patterns,
            selected_patterns=selected_patterns,
            target_modality=target_modality,
            seed=seed,
        )
        self.data_fp = Path(data_fp)
        if not self.data_fp.exists():
            raise FileNotFoundError(f"Data file not found: {data_fp}")
        # cache identity includes the column selection — keyed on the CSV
        # bytes alone, a cache built from the default columns would silently
        # serve an alternate-column request stale data. (.pt files the CSV
        # points at are NOT hashed: stat'ing 100k files per construction
        # costs more than the cache saves; regenerate the cache sidecars if
        # you rewrite tensors in place.)
        self._cache_cols = (audio_column, image_column, labels_column)
        self._load(audio_column, image_column, labels_column)
        self.initialise_missing_masks()
        logger.info(
            f"AVMNIST[{split}]: {self.num_samples} samples, "
            f"patterns {self.selected_patterns}"
        )

    def _digest(self) -> str:
        if not hasattr(self, "_digest_cache"):
            h = hashlib.sha1(self.data_fp.read_bytes())
            h.update("|".join(self._cache_cols).encode())
            self._digest_cache = h.hexdigest()[:12]
        return self._digest_cache

    def _cache_path(self) -> Path:
        """Legacy whole-split .npz cache (pre-round-3); read-only fallback,
        converted to mmap-able .npy sidecars on first touch."""
        return self.data_fp.with_suffix(f".{self._digest()}.npz")

    def _npy_path(self, name: str) -> Path:
        return self.data_fp.with_suffix(f".{self._digest()}.{name}.npy")

    def _mmap_cached(self) -> bool:
        paths = {n: self._npy_path(n) for n in ("audio", "image", "labels")}
        if not all(p.exists() for p in paths.values()):
            return False
        self.arrays = {
            Modality.AUDIO: np.load(paths["audio"], mmap_mode="r"),
            Modality.IMAGE: np.load(paths["image"], mmap_mode="r"),
        }
        self.labels = np.load(paths["labels"])  # tiny; load eagerly
        return True

    def _write_npy_cache(self, audio, image, labels) -> bool:
        try:
            for name, arr in (("audio", audio), ("image", image),
                              ("labels", labels)):
                np.save(self._npy_path(name), arr)
            logger.info(f"AVMNIST cache written: {self._npy_path('audio')}")
            return True
        except OSError as e:  # read-only data dir — just skip the cache
            logger.warning(f"could not write AVMNIST cache: {e}")
            return False

    def _load(self, audio_col: str, image_col: str, labels_col: str) -> None:
        if self._mmap_cached():
            return
        legacy = self._cache_path()
        if legacy.exists():
            z = np.load(legacy)
            audio, image, labels = z["audio"], z["image"], z["labels"]
            if self._write_npy_cache(audio, image, labels) and self._mmap_cached():
                return
            self.arrays = {Modality.AUDIO: audio, Modality.IMAGE: image}
            self.labels = labels
            return

        import pandas as pd
        import torch

        df = pd.read_csv(self.data_fp)
        missing = [c for c in (audio_col, image_col, labels_col) if c not in df.columns]
        if missing:
            raise ValueError(f"Missing required columns: {missing}")

        n = len(df)
        audio = np.zeros((n, *AUDIO_SHAPE), np.float32)
        image = np.zeros((n, *IMAGE_SHAPE, 1), np.float32)
        lut = _gist_earth_luma_lut()
        for i, row in enumerate(df.itertuples(index=False)):
            spec = torch.load(getattr(row, audio_col), weights_only=True)
            a = np.asarray(spec, np.float32)
            h, w = min(a.shape[0], AUDIO_SHAPE[0]), min(a.shape[1], AUDIO_SHAPE[1])
            audio[i, :h, :w] = a[:h, :w]
            img = np.asarray(
                torch.load(getattr(row, image_col), weights_only=False),
                np.uint8,
            )
            image[i, :, :, 0] = lut[img].astype(np.float32) / 255.0
        labels = df[labels_col].to_numpy(np.int64)
        if self._write_npy_cache(audio, image, labels) and self._mmap_cached():
            return
        self.arrays = {Modality.AUDIO: audio, Modality.IMAGE: image}
        self.labels = labels


class SyntheticAVMNIST(MultimodalArrayDataset):
    """Shape-identical synthetic stand-in (tests / bench without assets)."""

    NUM_CLASSES = 10
    AVAILABLE_MODALITIES = {"audio": Modality.AUDIO, "image": Modality.IMAGE}

    def __init__(
        self,
        data_fp=None,
        split: str = "train",
        target_modality=Modality.MULTIMODAL,
        *,
        missing_patterns=None,
        selected_patterns=None,
        num_samples: int = 512,
        seed: int = 0,
        **_unused,
    ) -> None:
        m_patterns = missing_patterns or {
            "ai": {Modality.AUDIO: 1.0, Modality.IMAGE: 1.0},
            "a": {Modality.AUDIO: 1.0, Modality.IMAGE: 0.0},
            "i": {Modality.AUDIO: 0.0, Modality.IMAGE: 1.0},
        }
        super().__init__(
            split=split,
            missing_patterns=m_patterns,
            selected_patterns=selected_patterns,
            target_modality=target_modality,
            seed=seed,
        )
        rng = np.random.default_rng(seed)
        self.labels = rng.integers(0, 10, size=num_samples).astype(np.int64)
        # class-dependent means so models can actually learn
        audio = rng.normal(size=(num_samples, *AUDIO_SHAPE)).astype(np.float32)
        image = rng.normal(size=(num_samples, *IMAGE_SHAPE, 1)).astype(np.float32)
        audio += self.labels[:, None, None] * 0.3
        image += self.labels[:, None, None, None] * 0.3
        self.arrays = {Modality.AUDIO: audio, Modality.IMAGE: image}
        self.initialise_missing_masks()
