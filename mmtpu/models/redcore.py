"""RedCore — VAE-transformer encoders + cross-modal generators + adaptive
modality weighting (reference: models/msa/redcore.py:19-497).

Forward: per-modality VAE transformer features (z, μ, logσ²); cross-modal
ResidualXE generators impute each modality from the other two; present
modalities keep their own features, missing ones take the generated
features (gated by the per-sample missing indices); fused classifier +
per-modality aux classifiers.

Deviation noted: the reference's tuple-unpack bug makes the audio missing
index alias the video one (redcore.py:162-170, `missing_index_A` assigned
twice); here each modality uses its own index.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.autoencoder import ResidualAE


class RedCore(nn.Module):
    netA: nn.Module
    netV: nn.Module
    netT: nn.Module
    netAE: nn.Module
    netC: nn.Module
    netAT_V: nn.Module
    netAV_T: nn.Module
    netVT_A: nn.Module
    netC_A: nn.Module
    netC_V: nn.Module
    netC_T: nn.Module
    share_weight: bool = False
    loss_beta: float = 0.95
    interval_i: int = 2
    eta: float = 0.001
    eta_ext: float = 1.5
    clip: float = 1.0
    feature_dim: int = 32
    lambda_one: float = 0.0008

    @nn.compact
    def __call__(
        self,
        A: jnp.ndarray,
        V: jnp.ndarray,
        T: jnp.ndarray,
        A_missing_index: jnp.ndarray,
        V_missing_index: jnp.ndarray,
        T_missing_index: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        f_A, mu_A, lv_A = self.netA(A, train=train)
        f_V, mu_V, lv_V = self.netV(V, train=train)
        f_T, mu_T, lv_T = self.netT(T, train=train)

        fusion = jnp.concatenate([f_A, f_V, f_T], axis=-1)
        recon_fusion, latent = self.netAE(fusion, train=train)
        if self.share_weight:
            cycle_ae = self.netAE
        else:
            cycle_ae = ResidualAE(
                self.netAE.layers, self.netAE.n_blocks, self.netAE.input_dim,
                dropout=0.0, use_bn=False, name="netAE_cycle",
            )
        recon_cycle, latent_cycle = cycle_ae(recon_fusion, train=train)

        gen_A, _ = self.netVT_A(jnp.concatenate([f_V, f_T], -1), train=train)
        gen_V, _ = self.netAT_V(jnp.concatenate([f_A, f_T], -1), train=train)
        gen_T, _ = self.netAV_T(jnp.concatenate([f_A, f_V], -1), train=train)

        iA = A_missing_index.reshape(-1, 1)
        iV = V_missing_index.reshape(-1, 1)
        iT = T_missing_index.reshape(-1, 1)
        f_A_r = iA * f_A + (1.0 - iA) * gen_A
        f_V_r = iV * f_V + (1.0 - iV) * gen_V
        f_T_r = iT * f_T + (1.0 - iT) * gen_T

        fusion_r = jnp.concatenate([f_A_r, f_V_r, f_T_r], axis=-1)
        return {
            "logits": self.netC(fusion_r, train=train),
            "logits_A": self.netC_A(f_A_r, train=train),
            "logits_V": self.netC_V(f_V_r, train=train),
            "logits_T": self.netC_T(f_T_r, train=train),
            "fusion": fusion,
            "recon_fusion": recon_fusion,
            "recon_cycle": recon_cycle,
            "latent": latent,
            "latent_cycle": latent_cycle,
            "feature_A_miss": f_A, "gen_A": gen_A, "fmu_A": mu_A, "flog_var_A": lv_A,
            "feature_V_miss": f_V, "gen_V": gen_V, "fmu_V": mu_V, "flog_var_V": lv_V,
            "feature_T_miss": f_T, "gen_T": gen_T, "fmu_T": mu_T, "flog_var_T": lv_T,
        }
