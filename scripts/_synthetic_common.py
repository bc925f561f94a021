"""Shared generative model for the synthetic MSA datasets (MOSI / MOSEI).

Latent scalar sentiment s -> per-modality features s*proj*snr + noise,
zeroed past each sample's length. `proj` is drawn ONCE per modality and
shared across splits — a per-split projection would give train and test
different feature mappings and make cross-split generalization impossible
by construction (this bug shipped once; keep the helper shared)."""

from __future__ import annotations

import numpy as np


def make_projs(rng, dims):
    """dims: {"audio": D_A, "vision": D_V, "text": D_T} -> unit-scale projs."""
    return {m: rng.normal(size=(d,)).astype(np.float32) for m, d in dims.items()}


def modality_features(rng, s, lengths, proj, snr, T):
    n = s.shape[0]
    base = s[:, None, None] * proj[None, None, :] * snr
    x = base + rng.normal(size=(n, T, proj.shape[0])).astype(np.float32)
    t = np.arange(T)[None, :, None]
    return (x * (t < lengths[:, None, None])).astype(np.float32)
