"""Generate learnable synthetic CMU-MOSI data at the real dataset's scale.

The reference ships no MOSI assets (configs point at unshipped
$EXP_PATH/DATA/mosi/aligned_50.pkl; schema per reference data/mosi.py:
per-split dict of audio (N,50,5), vision (N,50,20), text (N,50,768),
classification_labels {0,1,2}, regression_labels [-3,3], and per-sample
lengths). Real split sizes: 1284 train / 229 valid / 686 test.

Generation model (seeded): a latent sentiment s ~ U(-3,3) drives every
modality — text carries the strongest per-timestep signal, audio/vision
weaker ones (matching MSA folklore) — so the trimodal UttFusion pipeline,
its 7-pattern missing-modality evaluation, and the mono-pretrain deltas all
have real structure to learn.

Calibrated off the ceiling (round 3): each modality observes the latent
through independent per-sample noise (latent_sigma below; text cleanest),
putting the Bayes ceiling for the full ATV pattern near the published MOSI
band (Non0 accuracy/F1 ~0.75-0.85; /root/reference/README.md:36-40 is
qualitative, the band is the community-reported UttFusion range) instead
of the saturated 1.00 the uncorrupted model reached.

Usage: python scripts/make_synthetic_mosi.py [out_root=DATA]
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path

import numpy as np

from _synthetic_common import make_projs, modality_features

SPLITS = {"train": 1284, "valid": 229, "test": 686}
T, D_A, D_V, D_T = 50, 5, 20, 768


def main(out_root: str = "DATA") -> None:
    rng = np.random.default_rng(50)
    projs = make_projs(rng, {"audio": D_A, "vision": D_V, "text": D_T})
    data = {}
    for split, n in SPLITS.items():
        s = rng.uniform(-3, 3, size=n).astype(np.float32)
        lengths = rng.integers(20, T + 1, size=n)
        cls = np.where(s < -0.5, 0, np.where(s > 0.5, 2, 1)).astype(np.int64)
        data[split] = {
            "audio": modality_features(rng, s, lengths, projs["audio"], 0.35, T,
                                       latent_sigma=2.6),
            "vision": modality_features(rng, s, lengths, projs["vision"], 0.25, T,
                                        latent_sigma=3.0),
            "text": modality_features(rng, s, lengths, projs["text"], 0.12, T,
                                      latent_sigma=2.0),
            "classification_labels": cls,
            "regression_labels": s,
            "audio_lengths": lengths.astype(np.int64),
            "vision_lengths": lengths.astype(np.int64),
        }
        print(f"{split}: {n} samples")
    out = Path(out_root) / "mosi"
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "aligned_50.pkl", "wb") as f:
        pickle.dump(data, f)
    print("wrote", out / "aligned_50.pkl")
    # unaligned variant (self-mm missing_text_03 config points at it): a
    # second full generation pass where audio/vision draw INDEPENDENT
    # per-sample lengths and each modality's features are generated with
    # its own lengths — so every step the unaligned loader treats as valid
    # (data/mosi.py lengths routing) carries real signal, and steps past a
    # modality's length are zero padding exactly as the lengths declare.
    rng2 = np.random.default_rng(51)
    projs2 = make_projs(rng2, {"audio": D_A, "vision": D_V, "text": D_T})
    udata = {}
    for split, n in SPLITS.items():
        s = data[split]["regression_labels"]
        a_len = rng2.integers(20, T + 1, size=n)
        v_len = rng2.integers(20, T + 1, size=n)
        t_len = rng2.integers(20, T + 1, size=n)
        udata[split] = {
            "audio": modality_features(rng2, s, a_len, projs2["audio"], 0.35,
                                       T, latent_sigma=2.6),
            "vision": modality_features(rng2, s, v_len, projs2["vision"],
                                        0.25, T, latent_sigma=3.0),
            "text": modality_features(rng2, s, t_len, projs2["text"], 0.12,
                                      T, latent_sigma=2.0),
            "classification_labels": data[split]["classification_labels"],
            "regression_labels": s,
            "audio_lengths": a_len.astype(np.int64),
            "vision_lengths": v_len.astype(np.int64),
        }
    with open(out / "unaligned_50.pkl", "wb") as f:
        pickle.dump(udata, f)
    print("wrote", out / "unaligned_50.pkl")


if __name__ == "__main__":
    main(*sys.argv[1:])
