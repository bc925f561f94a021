"""IEMOCAP emotion recognition dataset (reference: data/iemocap.py:19-301).

Multi-file HDF5 layout: A/comparE.h5 (+ per-fold mean/std), V/denseface.h5,
T/bert_large.h5, utterance labels under target/{cv_no}/{split}_label.npy with
int2name keys. 10-fold CV via cv_no; trn/utt audio normalization; 4 classes.

TPU-native: utterance features are padded once to the split max length into
contiguous arrays with explicit length vectors (static shapes), instead of
per-batch pad_sequence.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from mmtpu.data.base import MultimodalArrayDataset
from mmtpu.data.mosi import DEFAULT_MSA_PATTERNS
from mmtpu.modalities import Modality
from mmtpu.utils.logging import get_logger

logger = get_logger()

_SPLIT_ALIASES = {"train": "trn", "valid": "val", "test": "tst"}


class IEMOCAP(MultimodalArrayDataset):
    NUM_CLASSES = 4
    AVAILABLE_MODALITIES = {
        "audio": Modality.AUDIO,
        "video": Modality.VIDEO,
        "text": Modality.TEXT,
    }

    def __init__(
        self,
        data_fp,
        split: str,
        selected_patterns: Optional[List[str]] = None,
        cv_no: int = 1,
        missing_patterns=None,
        target_modality=Modality.MULTIMODAL,
        *,
        target_dir_fp_fmt: str = "target/{cv_no}",
        norm_method: str = "trn",
        audio_type: str = "comparE",
        video_type: str = "denseface",
        text_type: str = "bert_large",
        max_len: int = 64,
        seed: int = 0,
        **_unused,
    ) -> None:
        super().__init__(
            split=split,
            missing_patterns=missing_patterns or dict(DEFAULT_MSA_PATTERNS),
            selected_patterns=selected_patterns,
            target_modality=target_modality,
            seed=seed,
        )
        assert 1 <= cv_no <= 10
        self.cv_no = cv_no
        self.norm_method = norm_method
        root = Path(data_fp)
        cv_root = root / target_dir_fp_fmt.format(cv_no=cv_no)
        ref_split = _SPLIT_ALIASES.get(self.split, self.split)

        import h5py

        labels_onehot = np.load(cv_root / f"{ref_split}_label.npy")
        self.labels = np.argmax(labels_onehot, axis=1).astype(np.int64)
        int2name = np.load(cv_root / f"{ref_split}_int2name.npy")
        names = [
            n[0].decode() if isinstance(n, (np.ndarray, list, tuple))
            else (n.decode() if isinstance(n, bytes) else str(n))
            for n in int2name
        ]

        files = {
            Modality.AUDIO: h5py.File(root / "A" / f"{audio_type}.h5", "r"),
            Modality.VIDEO: h5py.File(root / "V" / f"{video_type}.h5", "r"),
            Modality.TEXT: h5py.File(root / "T" / f"{text_type}.h5", "r"),
        }
        mean = std = None
        if audio_type == "comparE":
            with h5py.File(root / "A" / "comparE_mean_std.h5", "r") as ms:
                mean = np.asarray(ms[str(cv_no)]["mean"], np.float32)
                std = np.asarray(ms[str(cv_no)]["std"], np.float32)
                std[std == 0] = 1.0

        self.arrays = {}
        self.lengths: Dict[Modality, np.ndarray] = {}
        for mod, f in files.items():
            feats = [np.asarray(f[name], np.float32) for name in names]
            if mod == Modality.AUDIO and mean is not None and norm_method == "trn":
                feats = [(x - mean) / std for x in feats]
            elif mod == Modality.AUDIO and norm_method == "utt":
                feats = [
                    (x - x.mean(0, keepdims=True))
                    / np.clip(x.std(0, keepdims=True), 1e-8, None)
                    for x in feats
                ]
            dim = feats[0].shape[-1]
            L = min(max((x.shape[0] for x in feats), default=1), max_len)
            arr = np.zeros((len(feats), L, dim), np.float32)
            lens = np.zeros((len(feats),), np.int32)
            for i, x in enumerate(feats):
                n = min(x.shape[0], L)
                arr[i, :n] = x[:n]
                lens[i] = n
            self.arrays[mod] = arr
            self.lengths[mod] = lens
            f.close()

        self.initialise_missing_masks()
        logger.info(
            f"IEMOCAP[{self.split} cv{cv_no}]: {self.num_samples} samples"
        )
