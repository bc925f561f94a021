"""Composite reconstruction loss for CMAM training (reference: cmam_loss.py:24-276).

Term structure reproduced exactly: cosine(1-sim) + MAE + MSE always; optional
Gaussian-kernel MMD, moment matching, cyclic consistency, MINE-style mutual
information, and a downstream classification term. Returns a dict of weighted
terms plus 'total_loss' — the contract LossFunctionGroup/train steps rely on.

All terms are pure jnp (jit/grad-safe). The MI critic is a Flax module whose
params are carried by the CMAM train state; the permutation for negative
samples comes from an explicit PRNG key (functional, unlike torch.randperm).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from mmtpu.train import losses as L


def _cdist_sq(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise euclidean distances, (n, m)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True).T
    return jnp.maximum(x2 + y2 - 2.0 * (x @ y.T), 0.0)


def gaussian_kernel(x: jnp.ndarray, y: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    return jnp.exp(-_cdist_sq(x, y) / (2.0 * sigma**2))


def _pair_mean(k: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Kernel-matrix mean over real-row pairs (w is a (B,) 0/1 mask)."""
    if w is None:
        return k.mean()
    ww = w[:, None] * w[None, :]
    return jnp.sum(k * ww) / jnp.maximum(jnp.sum(ww), 1e-8)


def mmd_loss(
    x: jnp.ndarray, y: jnp.ndarray, sigma: float = 1.0,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    xx = gaussian_kernel(x, x, sigma)
    yy = gaussian_kernel(y, y, sigma)
    xy = gaussian_kernel(x, y, sigma)
    return (
        _pair_mean(xx, sample_mask)
        + _pair_mean(yy, sample_mask)
        - 2.0 * _pair_mean(xy, sample_mask)
    )


def _masked_mean0(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    if w is None:
        return jnp.mean(x, axis=0)
    ws = w.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sum(x * ws, axis=0) / jnp.maximum(jnp.sum(w), 1e-8)


def moment_matching_loss(
    x: jnp.ndarray, y: jnp.ndarray, num_moments: int = 2,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    loss = 0.0
    for i in range(1, num_moments + 1):
        xm = _masked_mean0(jnp.power(x, i), sample_mask)
        ym = _masked_mean0(jnp.power(y, i), sample_mask)
        loss = loss + jnp.mean((xm - ym) ** 2)
    return loss


class CMAMLoss:
    """Callable composite loss. Signature mirrors the reference forward()."""

    def __init__(
        self,
        x_dims: Union[int, Sequence[int]] = 0,
        z_dim: int = 0,
        cosine_weight: float = 1.0,
        mae_weight: float = 1.0,
        mse_weight: float = 1.0,
        rec_weight: float = 1.0,
        cls_weight: float = 0.005,
        mmd_weight: float = 0.0,
        moment_weight: float = 0.0,
        cyclic_weight: float = 0.0,
        mi_weight: float = 0.0,
        num_moments: int = 2,
        mmd_sigma: float = 1.0,
        maximize_cosine: bool = True,
        epsilon: float = 1e-8,
        cls_loss_type: str = "ce",
        num_classes: Optional[int] = None,
    ) -> None:
        self.cosine_weight = cosine_weight
        self.mae_weight = mae_weight
        self.mse_weight = mse_weight
        # rec_weight/maximize_cosine: accepted-but-unused IN THE REFERENCE
        # TOO (cmam_loss.py:71,79 store them; the maximize_cosine branch is
        # commented out at :236 and rec_weight never scales the total).
        # Kept so reference configs construct unchanged; no effect in
        # either framework.
        self.rec_weight = rec_weight
        self.cls_weight = cls_weight
        self.mmd_weight = mmd_weight
        self.moment_weight = moment_weight
        self.cyclic_weight = cyclic_weight
        self.mi_weight = mi_weight
        self.num_moments = num_moments
        self.mmd_sigma = mmd_sigma
        self.maximize_cosine = maximize_cosine
        self.epsilon = epsilon
        self.cls_loss_type = cls_loss_type.lower()
        self.x_dims = x_dims
        self.z_dim = z_dim

        if self.cls_loss_type == "ce":
            self._cls_loss = L.cross_entropy
        elif self.cls_loss_type == "bce":
            self._cls_loss = L.bce_with_logits
        elif self.cls_loss_type == "mse":
            self._cls_loss = L.mse
        else:
            raise ValueError(f"Unsupported cls_loss_type: {cls_loss_type}")

    def __call__(
        self,
        predictions: jnp.ndarray,
        targets: jnp.ndarray,
        originals: Optional[List[jnp.ndarray]] = None,
        reconstructed: Optional[jnp.ndarray] = None,
        forward_func: Optional[Callable] = None,
        cls_logits: Optional[jnp.ndarray] = None,
        cls_labels: Optional[jnp.ndarray] = None,
        mi_critic: Optional[Callable] = None,
        rng: Optional[jax.Array] = None,
        sample_mask: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """sample_mask (B,) zeroes padded tail rows out of every term —
        padded rows would otherwise push garbage-reconstruction gradients
        into the CMAM each epoch (the torch reference feeds ragged tail
        batches and never sees padding)."""
        p = predictions.astype(jnp.float32)
        t = targets.astype(jnp.float32)
        sm = sample_mask

        sim = jnp.sum(p * t, axis=1) / (
            jnp.linalg.norm(p, axis=1) * jnp.linalg.norm(t, axis=1) + self.epsilon
        )
        cosine_loss = (1.0 - L._masked_reduce(sim, sm)) * self.cosine_weight
        mae = L.l1(p, t, sample_mask=sm) * self.mae_weight
        mse = L.mse(p, t, sample_mask=sm) * self.mse_weight

        total = cosine_loss + mae + mse
        out: Dict[str, Any] = {"cosine": cosine_loss, "mae": mae, "mse": mse}

        if self.mmd_weight > 0:
            mmd = mmd_loss(p, t, self.mmd_sigma, sample_mask=sm)
            total = total + self.mmd_weight * mmd
            out["mmd"] = mmd

        if self.moment_weight > 0:
            mm = moment_matching_loss(p, t, self.num_moments, sample_mask=sm)
            total = total + self.moment_weight * mm
            out["moment_loss"] = mm

        if (
            self.cyclic_weight > 0
            and originals is not None
            and reconstructed is not None
            and forward_func is not None
        ):
            cyc = L.mse(forward_func(reconstructed), originals, sample_mask=sm)
            total = total + self.cyclic_weight * cyc
            out["cyclic_loss"] = cyc

        if self.mi_weight > 0 and originals is not None and mi_critic is not None:
            if rng is None:
                raise ValueError("MI term requires an explicit PRNG key")
            perm = jax.random.permutation(rng, p.shape[0])
            pos = mi_critic(originals, p)
            neg = mi_critic(originals, p[perm])
            if sm is None:
                mi = -jnp.mean(pos) + jnp.log(
                    jnp.mean(jnp.exp(neg)) + self.epsilon
                )
            else:
                w = sm.reshape(-1)
                # negatives pair originals[i] with p[perm[i]]: both rows
                # must be real for the pair to count
                wn = w * w[perm]
                mi = -L._masked_reduce(pos.reshape(-1), w) + jnp.log(
                    jnp.sum(jnp.exp(neg.reshape(-1)) * wn)
                    / jnp.maximum(jnp.sum(wn), 1e-8)
                    + self.epsilon
                )
            total = total + self.mi_weight * mi
            out["mi_loss"] = mi

        if self.cls_weight > 0 and cls_logits is not None and cls_labels is not None:
            cls = self._cls_loss(cls_logits, cls_labels, sample_mask=sm)
            total = total + self.cls_weight * cls
            out["cls_loss"] = cls

        out["total_loss"] = total
        return out
