"""UttFusion — the trimodal MOSI/MOSEI late-fusion workhorse.

Reference: models/msa/utt_fusion.py:25-294. netA/netV = LSTMEncoders,
netT = TextCNN, netC = FcClassifier over concat(a, v, t). The reference
encodes padded sequences without packing in this model (forward :106-142),
so no length masking here either; grad clipping (`clip`) is applied in the
optimizer chain by the trainer when configured.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class UttFusionModel(nn.Module):
    netA: nn.Module
    netV: nn.Module
    netT: nn.Module
    netC: nn.Module
    clip: Optional[float] = None
    pretrained_path: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        A: Optional[jnp.ndarray] = None,
        V: Optional[jnp.ndarray] = None,
        T: Optional[jnp.ndarray] = None,
        *,
        is_embd_A: bool = False,
        is_embd_V: bool = False,
        is_embd_T: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:
        assert not (A is None and V is None and T is None)
        assert not (is_embd_A and is_embd_V and is_embd_T)
        embd_A = embd_V = None
        if self._can_stack(A, V, is_embd_A, is_embd_V):
            # Both modality LSTMs advanced by ONE scan (half the serial
            # chain on TPU); mathematically identical to separate calls.
            from mmtpu.models.lstm import encode_pair_stacked

            embd_A, embd_V = encode_pair_stacked(self.netA, self.netV, A, V)
        embds = []
        if A is not None:
            embds.append(
                A if is_embd_A
                else (embd_A if embd_A is not None else self.netA(A, train=train))
            )
        if V is not None:
            embds.append(
                V if is_embd_V
                else (embd_V if embd_V is not None else self.netV(V, train=train))
            )
        if T is not None:
            embds.append(T if is_embd_T else self.netT(T, train=train))
        fused = jnp.concatenate(embds, axis=-1)
        return self.netC(fused, train=train)

    def _can_stack(self, A, V, is_embd_A: bool, is_embd_V: bool) -> bool:
        from mmtpu.models.lstm import can_stack_pair

        return (
            not is_embd_A and not is_embd_V
            and can_stack_pair(self.netA, self.netV, A, V)
        )

    def encode(self, A, V, T, train: bool = False):
        return (
            self.netA(A, train=train),
            self.netV(V, train=train),
            self.netT(T, train=train),
        )
