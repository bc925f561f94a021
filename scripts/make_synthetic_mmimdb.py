"""Generate learnable synthetic MM-IMDb data at the real dataset's scale.

The reference ships no MM-IMDb assets (configs point at unshipped
$EXP_PATH/DATA/mmimdb/*.hdf5, reference data/mmimdb.py:53-56 schema:
vgg_features 4096-d image, features 300-d text, genres 23-way multilabel).
Real split sizes: 15552 train / 2608 dev / 7799 test.

Generation model (seeded): each sample draws 1-3 of 23 genres with a skewed
popularity prior; modality features are linear genre embeddings + Gaussian
noise computed from a CORRUPTED copy of the genre vector (20% of active
genres dropped, 2% spurious activations) so the achievable F1 ceiling sits
well below 1.0 — in the real dataset's 0.5-0.6 F1_samples band — and the
scratch-vs-pretrained deltas (BASELINE.md rows 6-8) have room to show.
Per-dimension SNRs are calibrated so aggregate separability (snr·√dim) is
moderate for both channels.

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
    txt_emb = rng.normal(size=(N_GENRES, D_TXT)).astype(np.float32)

    out = Path(out_root) / "mmimdb"
    out.mkdir(parents=True, exist_ok=True)
    for split, n in SPLITS.items():
        k = rng.integers(1, 4, size=n)
        genres = np.zeros((n, N_GENRES), np.float32)
        for i in range(n):
            idx = rng.choice(N_GENRES, size=k[i], replace=False, p=pop)
            genres[i, idx] = 1.0
        # features see a corrupted label view: the F1 ceiling stays < 1
        corrupted = genres.copy()
        drop = (rng.random(genres.shape) < 0.20) & (genres > 0)
        spurious = (rng.random(genres.shape) < 0.02) & (genres == 0)
        corrupted[drop] = 0.0
        corrupted[spurious] = 1.0
        img = corrupted @ img_emb * 0.04 + rng.normal(
            size=(n, D_IMG)
        ).astype(np.float32)
        txt = corrupted @ txt_emb * 0.22 + rng.normal(
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
