"""Generate learnable synthetic CMU-MOSEI data (reference ch3_experiments
configs point at unshipped $EXP_PATH/DATA/mosei/aligned.pkl; real dims
audio 74 / vision 35 / text 768, aligned length 50).

Split sizes are scaled to 4000/600/1200 (real: 16326/1871/4659) so the
whole dataset fits the device-resident HBM budget on one chip — the axon
host link (~16 MB/s) makes streaming the full-size text features
impractical in this environment. Same latent-sentiment generative model as
scripts/make_synthetic_mosi.py.

Usage: python scripts/make_synthetic_mosei.py [out_root=DATA]
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path

import numpy as np

from _synthetic_common import make_projs, modality_features

SPLITS = {"train": 4000, "valid": 600, "test": 1200}
T, D_A, D_V, D_T = 50, 74, 35, 768


def main(out_root: str = "DATA") -> None:
    rng = np.random.default_rng(71)
    projs = make_projs(rng, {"audio": D_A, "vision": D_V, "text": D_T})
    data = {}
    for split, n in SPLITS.items():
        s = rng.uniform(-3, 3, size=n).astype(np.float32)
        lengths = rng.integers(20, T + 1, size=n)
        cls = np.where(s < -0.5, 0, np.where(s > 0.5, 2, 1)).astype(np.int64)
        data[split] = {
            # latent_sigma: per-modality observation noise. MOSEI's sweep
            # tracks F1_MACRO (neutral class included), which is far more
            # noise-sensitive than the Non0 metrics MOSI's sigmas were
            # tuned for: at MOSI's 2.6/3.0/2.0 the fused Bayes ceiling is
            # F1_Macro 0.52 — the trained model hit exactly that and the
            # missing-rate crossover drowned (all patterns 0.40-0.57 at
            # every rate). These lighter sigmas put the ceilings at
            # fused 0.85 / text 0.82 / audio 0.71 / vision 0.63
            # (MAP-classifier Monte Carlo): off the saturated 1.0 ceiling,
            # text clearly dominant (so rate-0 training over-relies on it
            # and collapses on text-missing patterns), and enough
            # single-modality headroom for the rescue to have magnitude.
            "audio": modality_features(rng, s, lengths, projs["audio"], 0.35, T,
                                       latent_sigma=0.8),
            "vision": modality_features(rng, s, lengths, projs["vision"], 0.25, T,
                                        latent_sigma=1.0),
            "text": modality_features(rng, s, lengths, projs["text"], 0.12, T,
                                      latent_sigma=0.5),
            "classification_labels": cls,
            "regression_labels": s,
            "audio_lengths": lengths.astype(np.int64),
            "vision_lengths": lengths.astype(np.int64),
        }
        print(f"{split}: {n} samples")
    out = Path(out_root) / "mosei"
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "aligned.pkl", "wb") as f:
        pickle.dump(data, f)
    print("wrote", out / "aligned.pkl")


if __name__ == "__main__":
    main(*sys.argv[1:])
