"""MMIMDb genre-classification family (reference: models/mmimdb.py:20-338).

MMIMDbModalityEncoder: BatchNorm → Dense.
MLPGenreClassifier: (BN → MaxOut → Dropout) × 2 → BN → Dense (23 logits).
MMIMDb: encoders → GMU or MultimodalPooling fusion → classifier; multilabel
sigmoid + binary_threshold predictions (handled by ClassificationTask with
multilabel=True).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm

from mmtpu.models.fusion import MaxOut, MultimodalPooling


class MMIMDbModalityEncoder(nn.Module):
    input_dim: int
    output_dim: int

    def get_embedding_size(self) -> int:
        return self.output_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = batch_norm(x, train=train, name="bn")
        return nn.Dense(self.output_dim, name="fc")(x)


class MLPGenreClassifier(nn.Module):
    input_size: int
    output_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = batch_norm(x, train=train, name="bn0")
        x = MaxOut(self.input_size, self.hidden_size, use_bias=False, name="maxout0")(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = batch_norm(x, train=train, name="bn1")
        x = MaxOut(self.hidden_size, self.hidden_size, use_bias=False, name="maxout1")(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = batch_norm(x, train=train, name="bn2")
        return nn.Dense(self.output_size, name="fc_out")(x)


class MMIMDb(nn.Module):
    image_encoder: nn.Module
    text_encoder: nn.Module
    classifier: nn.Module
    gated_bimodal_network: Optional[nn.Module] = None
    multimodal_pooling: Optional[Dict[str, Any]] = None
    binary_threshold: float = 0.5

    @nn.compact
    def __call__(
        self,
        I: Optional[jnp.ndarray] = None,
        T: Optional[jnp.ndarray] = None,
        *,
        is_embd_I: bool = False,
        is_embd_T: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:
        assert I is not None or T is not None
        assert not (is_embd_I and is_embd_T)
        image = I if is_embd_I else self.image_encoder(I, train=train)
        text = T if is_embd_T else self.text_encoder(T, train=train)

        if self.multimodal_pooling is not None:
            fusion = MultimodalPooling(
                input_dim_a=self.image_encoder.output_dim,
                input_dim_b=self.text_encoder.output_dim,
                output_dim=self.classifier.input_size,
                pooling_type=self.multimodal_pooling.get("pooling_type", "gated"),
                hidden_dim=self.multimodal_pooling.get("hidden_dim") or 0,
                dropout=self.multimodal_pooling.get("dropout", 0.0),
                name="fusion_module",
            )
            z = fusion(image, text, train=train)
        elif self.gated_bimodal_network is not None:
            z = self.gated_bimodal_network(image, text, train=train)
        else:
            raise ValueError(
                "Either gated_bimodal_network or multimodal_pooling must be provided"
            )
        return self.classifier(z, train=train)

    def encode(self, I, T, train: bool = False):
        return (
            self.image_encoder(I, train=train),
            self.text_encoder(T, train=train),
        )
