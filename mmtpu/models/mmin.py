"""MMIN — missing-modality imputation network (reference: models/msa/mmin.py:23-274).

Own encoders (netA/netV/netT) over the *masked* inputs, cascaded ResidualAE
(+ cycle AE) reconstructing the full-modality fusion embedding, classifier
over the AE latent. The frozen pretrained UttFusion teacher encodes the
*reverse* (complement) inputs; its embedding is the imputation target
consumed by the training step (mmtpu/train/mmin_step.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.autoencoder import ResidualAE


class MMIN(nn.Module):
    netA: nn.Module
    netV: nn.Module
    netT: nn.Module
    netAE: nn.Module
    netC: nn.Module
    clip: Optional[float] = None
    share_weight: bool = False
    pretrained_model: Any = None  # teacher handled by the step (frozen)

    @nn.compact
    def __call__(
        self,
        A: jnp.ndarray,
        V: jnp.ndarray,
        T: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        from mmtpu.models.lstm import can_stack_pair, encode_pair_stacked

        if can_stack_pair(self.netA, self.netV, A, V):
            # one stacked scan for both modality LSTMs (see lstm.py)
            a, v = encode_pair_stacked(self.netA, self.netV, A, V)
        else:
            a = self.netA(A, train=train)
            v = self.netV(V, train=train)
        t = self.netT(T, train=train)
        fusion = jnp.concatenate([a, v, t], axis=-1)

        recon_fusion, latent = self.netAE(fusion, train=train)
        if self.share_weight:
            cycle_ae = self.netAE
        else:
            cycle_ae = ResidualAE(
                self.netAE.layers,
                self.netAE.n_blocks,
                self.netAE.input_dim,
                dropout=0.0,
                use_bn=False,
                name="netAE_cycle",
            )
        recon_cycle, latent_cycle = cycle_ae(recon_fusion, train=train)
        logits = self.netC(latent, train=train)
        return {
            "audio": a,
            "video": v,
            "text": t,
            "fusion": fusion,
            "recon_fusion": recon_fusion,
            "recon_cycle": recon_cycle,
            "latent": latent,
            "latent_cycle": latent_cycle,
            "logits": logits,
        }
