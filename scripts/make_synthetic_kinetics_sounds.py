"""Generate learnable synthetic Kinetics-Sounds at the reference layout.

Real KS assets are not shipped; the reference loader
(data/kinetics_sounds.py, ours mmtpu/data/kinetics_sounds.py) reads CSVs
with `audio`/`video`/`label` columns of torch-saved tensor paths:
audio = (128, 128) log-mel-like spectrogram, video = (400,) pooled
feature vector, 26 classes.

Signal model: class-dependent mean patterns (audio: a low-rank 2-D
pattern per class; video: a direction per class) + noise, audio carrying
the stronger channel as reported for real KS.

Usage: python scripts/make_synthetic_kinetics_sounds.py \
         [--root DATA/kinetics-sounds] [--per-class 30] [--seed 0]
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import numpy as np
import torch

N_CLASSES = 26
SPLIT_FRACS = {"train": 0.6, "validation": 0.2, "test": 0.2}
AUDIO_SHAPE = (128, 128)
D_VIDEO = 400
SNR_AUDIO, SNR_VIDEO = 0.5, 0.35
# NO feature-side label corruption for this family. Calibration history:
# KS was never at the ceiling (flip=0 round-2 run: test AV 0.532 on 26
# classes), so the anti-saturation guard the MOSI/IEMOCAP/MOSEI
# generators carry is unnecessary here — and actively harmful. Because
# the corruption is feature-side (features drawn from a flipped class's
# prototype) and splits are carved after generation, the VALIDATION set
# inherits it too; once the model grows confident, cross-entropy on those
# genuinely-wrong-feature samples is unbounded, validation loss explodes
# while validation accuracy climbs, and the reference config's val-LOSS
# checkpoint selection (save_metric: "loss",
# kinetics_sounds_baseline.yaml) restores a near-chance early epoch
# (flips 0.10/0.15 at SNR 0.5/0.35 and 1.0/0.7 both collapsed to test
# AV 0.05-0.13; flips 0.35/0.50 were outright unlearnable at 18 clean
# train samples/class).
FLIP_AUDIO, FLIP_VIDEO = 0.0, 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="DATA/kinetics-sounds")
    ap.add_argument("--per-class", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    root = Path(args.root)
    (root / "tensors").mkdir(parents=True, exist_ok=True)

    # class prototypes, shared across splits
    a_u = rng.normal(size=(N_CLASSES, AUDIO_SHAPE[0], 1)).astype(np.float32)
    a_v = rng.normal(size=(N_CLASSES, 1, AUDIO_SHAPE[1])).astype(np.float32)
    audio_proto = a_u * a_v / np.sqrt(AUDIO_SHAPE[0])
    video_proto = (rng.normal(size=(N_CLASSES, D_VIDEO)) / np.sqrt(D_VIDEO)).astype(
        np.float32
    )

    n_total = args.per_class * N_CLASSES
    labels = np.repeat(np.arange(N_CLASSES), args.per_class)
    rng.shuffle(labels)

    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from _synthetic_common import corrupt_labels

    seen_a = corrupt_labels(rng, labels, N_CLASSES, FLIP_AUDIO)
    seen_v = corrupt_labels(rng, labels, N_CLASSES, FLIP_VIDEO)

    rows = []
    for i, y in enumerate(labels):
        audio = (
            SNR_AUDIO * audio_proto[seen_a[i]] * np.sqrt(AUDIO_SHAPE[0])
            + rng.normal(size=AUDIO_SHAPE)
        ).astype(np.float32)
        video = (
            SNR_VIDEO * video_proto[seen_v[i]] * np.sqrt(D_VIDEO)
            + rng.normal(size=(D_VIDEO,))
        ).astype(np.float32)
        ap_, vp_ = root / "tensors" / f"a_{i:05d}.pt", root / "tensors" / f"v_{i:05d}.pt"
        torch.save(torch.from_numpy(audio), ap_)
        torch.save(torch.from_numpy(video), vp_)
        rows.append((str(ap_.resolve()), str(vp_.resolve()), int(y)))

    order = rng.permutation(n_total)
    bounds, acc = {}, 0
    for split, frac in SPLIT_FRACS.items():
        n = int(round(frac * n_total))
        bounds[split] = order[acc: acc + n]
        acc += n

    for split, idx in bounds.items():
        with open(root / f"{split}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["audio", "video", "class"])
            for i in idx:
                w.writerow(rows[i])
        print(f"{split}: {len(idx)} samples")
    print(f"synthetic kinetics-sounds at {root}: {n_total} clips, 26 classes")


if __name__ == "__main__":
    main()
