"""CMAM — cross-modal association model (reference: models/cmams.py:32-895).

Per-input-modality encoders → concat/sum/mean fusion → AssociationNetwork
MLP predicting the TARGET modality's embedding. Trained against a frozen
base model: teacher embedding under stop_gradient, reconstruction loss
(CMAMLoss) plus classification of the reconstructed embedding pushed back
through the teacher (train_cmam step, mmtpu/train/cmam_step.py).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.norm import batch_norm

from mmtpu.modalities import Modality


class AssociationNetwork(nn.Module):
    input_size: int
    hidden_size: int
    output_size: int
    batch_norm: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, name="fc_0")(x)
        if self.batch_norm:
            x = batch_norm(x, train=train, name="bn")
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_size, name="fc_1")(x)


class InputEncoders(dict):
    """Modality → encoder module/spec mapping (YAML `!InputEncoders`)."""

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "InputEncoders":
        return cls(data)


def _coerce_encoders(input_encoders) -> Dict[str, Any]:
    from mmtpu.config.spec import ModuleSpec

    out = {}
    for k, v in dict(input_encoders).items():
        key = str(Modality(str(k)))
        out[key] = v.build() if isinstance(v, ModuleSpec) else v
    return out


class CMAM(nn.Module):
    input_encoders: Any
    association_network: Any
    target_modality: Any
    fusion_fn: str = "concat"
    grad_clip: float = 0.0
    labels_key: str = "labels"
    load_pretrained_encoder_state_for: Any = ()

    def setup(self) -> None:
        from mmtpu.config.spec import ModuleSpec

        self.encoders = _coerce_encoders(self.input_encoders)
        net = self.association_network
        if isinstance(net, ModuleSpec):
            net = net.build()
        elif hasattr(net, "items") and not isinstance(net, nn.Module):
            # plain dict / FrozenDict of constructor kwargs (linen converts
            # dict-valued attributes into FrozenDicts)
            net = AssociationNetwork(**dict(net))
        self.assoc = net

    def __call__(
        self, modalities: Dict[str, jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        embeddings = [
            self.encoders[k](modalities[k], train=train)
            for k in sorted(self.encoders)
        ]
        fn = self.fusion_fn.lower()
        if fn == "concat":
            z = jnp.concatenate(embeddings, axis=1)
        elif fn == "sum":
            z = jnp.sum(jnp.stack(embeddings), axis=0)
        elif fn == "mean":
            z = jnp.mean(jnp.stack(embeddings), axis=0)
        else:
            raise ValueError(f"Unknown fusion function: {self.fusion_fn}")
        return self.assoc(z, train=train)


class DualCMAM(nn.Module):
    """Single-input dual-target C-MAM (reference: models/cmams.py:553-895).

    One input-modality encoder feeds TWO decoder MLPs
    (Linear→ReLU→Dropout→Linear, cmams.py:589-604), each reconstructing a
    different target modality's embedding. Training sums the two CMAMLoss
    dicts and classifies through the frozen base model with BOTH
    reconstructed embeddings substituted (cmams.py:626-727) — see
    mmtpu/train/cmam_step.py DualCMAMTask.
    """

    input_encoder: Any
    shared_encoder_output_size: int
    decoder_hidden_size: int
    target_modality_one_embd_size: int
    target_modality_two_embd_size: int
    input_modality: Any = "audio"
    target_modality_one: Any = "video"
    target_modality_two: Any = "text"
    dropout: float = 0.1
    grad_clip: float = 0.0
    binarize: bool = False
    load_pretrained_encoder_state_for: Any = ()

    def setup(self) -> None:
        from mmtpu.config.spec import ModuleSpec

        enc = self.input_encoder
        if isinstance(enc, ModuleSpec):
            enc = enc.build()
        elif hasattr(enc, "items") and not isinstance(enc, nn.Module):
            # {modality: encoder} mapping like the reference's
            # input_encoder_info dict — take the single entry
            enc = _coerce_encoders(enc)
            enc = enc[next(iter(sorted(enc)))]
        self.encoder = enc

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> tuple:
        h = self.encoder(x, train=train)

        def decoder(name: str, out_size: int) -> jnp.ndarray:
            z = nn.Dense(self.decoder_hidden_size, name=f"{name}_fc_0")(h)
            z = nn.relu(z)
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
            return nn.Dense(out_size, name=f"{name}_fc_1")(z)

        return (
            decoder("decoder_one", self.target_modality_one_embd_size),
            decoder("decoder_two", self.target_modality_two_embd_size),
        )
