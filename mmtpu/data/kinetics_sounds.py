"""Kinetics-Sounds dataset (reference: data/kinetics_sounds.py:12-104).

CSV-indexed audio/video tensor files (torch-saved), 26 classes, patterns
over {audio, video} ("av"/"a"/"v"). Decoded once into contiguous arrays."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from mmtpu.data.base import MultimodalArrayDataset
from mmtpu.modalities import Modality
from mmtpu.utils.logging import get_logger

logger = get_logger()

DEFAULT_PATTERNS = {
    "av": {Modality.AUDIO: 1.0, Modality.VIDEO: 1.0},
    "a": {Modality.AUDIO: 1.0, Modality.VIDEO: 0.0},
    "v": {Modality.AUDIO: 0.0, Modality.VIDEO: 1.0},
}


class KineticsSounds(MultimodalArrayDataset):
    NUM_CLASSES = 26
    AVAILABLE_MODALITIES = {"audio": Modality.AUDIO, "video": Modality.VIDEO}

    def __init__(
        self,
        data_fp,
        split: str,
        target_modality=Modality.MULTIMODAL,
        *,
        missing_patterns=None,
        selected_patterns: Optional[List[str]] = None,
        audio_key: str = "audio",
        video_key: str = "video",
        labels_key: str = "label",
        seed: int = 0,
        **_unused,
    ) -> None:
        super().__init__(
            split=split,
            missing_patterns=missing_patterns or dict(DEFAULT_PATTERNS),
            selected_patterns=selected_patterns,
            target_modality=target_modality,
            seed=seed,
        )
        path = Path(data_fp)
        if not path.exists():
            raise FileNotFoundError(f"File not found: {path}")

        import pandas as pd
        import torch

        df = (
            pd.read_parquet(path) if path.suffix == ".parquet" else pd.read_csv(path)
        )
        for key in (audio_key, video_key, labels_key):
            if key not in df.columns:
                raise ValueError(f"Key not found in the dataset: {key}")

        audio_list, video_list = [], []
        for row in df.itertuples(index=False):
            audio_list.append(
                np.asarray(
                    torch.load(getattr(row, audio_key), weights_only=True), np.float32
                )
            )
            video_list.append(
                np.asarray(
                    torch.load(getattr(row, video_key), weights_only=True), np.float32
                )
            )
        self.arrays = {
            Modality.AUDIO: np.stack(audio_list),
            Modality.VIDEO: np.stack(video_list),
        }
        self.labels = df[labels_key].to_numpy(np.int64)
        self.initialise_missing_masks()
        logger.info(f"KineticsSounds[{self.split}]: {self.num_samples} samples")
