"""GCNet masked losses (reference: loss_functions/gcnet_loss.py:13-174).

Pure-jnp functional forms of the reference's three masked losses for
conversational data. All inputs are batch-major padded tensors; umask
marks valid utterances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_recon_loss(
    recon: jnp.ndarray,
    target: jnp.ndarray,
    present_mask: jnp.ndarray,
    umask: jnp.ndarray,
    adim: int,
    tdim: int,
    vdim: int,
) -> jnp.ndarray:
    """MSE on *missing* modalities only (MaskedReconLoss, gcnet_loss.py:13-104).

    recon/target: [B, T, adim+tdim+vdim]; present_mask: [B, T, 3] with 1 =
    modality present (loss weight is ``1 - present``, the reference's
    ``-1 * (miss_idx - 1)``); umask: [B, T]. Per-modality sums are divided
    by that modality's dim, and the total by sum(umask).
    """
    um = umask[..., None].astype(recon.dtype)
    se = (recon * um - target * um) ** 2  # [B, T, D]
    splits = [
        (0, adim, 0, adim),
        (adim, adim + tdim, 1, tdim),
        (adim + tdim, adim + tdim + vdim, 2, vdim),
    ]
    total = 0.0
    for lo, hi, m, dim in splits:
        w = (1.0 - present_mask[..., m]).astype(recon.dtype)[..., None]
        total = total + jnp.sum(se[..., lo:hi] * w) / dim
    return total / jnp.sum(umask)


def masked_ce_loss(
    logits: jnp.ndarray, target: jnp.ndarray, umask: jnp.ndarray
) -> jnp.ndarray:
    """Masked cross entropy (MaskedCELoss, gcnet_loss.py:107-139).

    Faithful to the reference mechanics: log-probs are multiplied by umask
    (zeroing padded rows) and padded targets collapse to class 0, whose
    zeroed log-prob contributes nothing; normalized by sum(umask).
    logits [B, T, C] (or [N, C]), target [B, T] int, umask same shape.
    """
    logp = jnp.reshape(jax.nn.log_softmax(logits, axis=-1),
                       (-1, logits.shape[-1]))
    um = jnp.reshape(umask, (-1, 1)).astype(logits.dtype)
    tgt = (jnp.reshape(target, (-1,)) * jnp.reshape(umask, (-1,))).astype(jnp.int32)
    picked = jnp.take_along_axis(logp * um, tgt[:, None], axis=-1)[:, 0]
    return -jnp.sum(picked) / jnp.sum(umask)


def masked_mse_loss(
    pred: jnp.ndarray, target: jnp.ndarray, umask: jnp.ndarray
) -> jnp.ndarray:
    """Masked MSE for MOSI/MOSEI regression (MaskedMSELoss,
    gcnet_loss.py:142-174)."""
    p = jnp.reshape(pred, (-1,)) * jnp.reshape(umask, (-1,))
    t = jnp.reshape(target, (-1,)) * jnp.reshape(umask, (-1,))
    return jnp.sum((p - t) ** 2) / jnp.sum(umask)
