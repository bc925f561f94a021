"""Shared generative model for the synthetic MSA datasets (MOSI / MOSEI).

Latent scalar sentiment s -> per-modality features s_m*proj*snr + noise,
zeroed past each sample's length. `proj` is drawn ONCE per modality and
shared across splits — a per-split projection would give train and test
different feature mappings and make cross-split generalization impossible
by construction (this bug shipped once; keep the helper shared).

Calibration (round 3): each modality observes a CORRUPTED latent
s_m = s + latent_sigma * eps (eps per sample per modality) while labels
derive from the clean s. Averaging over time/feature dims cannot remove
this noise, so the Bayes ceiling sits below 1.0 — tuned to land the full
trimodal pattern in the published MOSI band (Non0 accuracy/F1 ~0.75-0.85)
instead of the saturated 0.99-1.0 the uncorrupted model gave. Independent
per-modality corruption also gives multimodal fusion real headroom over
any single modality (averaging K views shrinks sigma by ~sqrt(K)).
"""

from __future__ import annotations

import numpy as np


def make_projs(rng, dims):
    """dims: {"audio": D_A, "vision": D_V, "text": D_T} -> unit-scale projs."""
    return {m: rng.normal(size=(d,)).astype(np.float32) for m, d in dims.items()}


def modality_features(rng, s, lengths, proj, snr, T, latent_sigma=0.0):
    """(n, T, D) features from latent s; latent_sigma>0 adds the
    irreducible per-sample observation noise described above."""
    n = s.shape[0]
    s_obs = s
    if latent_sigma:
        s_obs = s + latent_sigma * rng.normal(size=n).astype(np.float32)
    base = s_obs[:, None, None] * proj[None, None, :] * snr
    x = base + rng.normal(size=(n, T, proj.shape[0])).astype(np.float32)
    t = np.arange(T)[None, :, None]
    return (x * (t < lengths[:, None, None])).astype(np.float32)


def corrupt_labels(rng, labels, n_classes, p):
    """Resample a fraction p of labels uniformly (feature-side view only):
    the classification ceiling becomes ~(1-p) + p/n_classes per single
    view, higher when independent corrupted views are fused."""
    out = labels.copy()
    flip = rng.random(labels.shape[0]) < p
    out[flip] = rng.integers(0, n_classes, int(flip.sum()))
    return out
