"""AVMNIST encoders + late-fusion model (reference: models/avmnist.py:34-410).

MNISTAudio/MNISTImage: two ConvBlocks with max-pools, flatten, Dense to
hidden_dim. AVMNIST: concat(audio_embd, image_embd) → Dense(hidden) → ReLU
→ Dropout → Dense(hidden/2) → ReLU → Dense(10).

TPU-first inversions: the model owns only the forward pass — train/eval
steps are pure jitted functions in mmtpu/train/ (the reference's
model.train_step mutates optimizer state and does .to(device)/.cpu() inside
the step, models/avmnist.py:269-310, which is illegal under jit).
`is_embd_*` switches accept precomputed embeddings (CMAM teacher path).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.conv import ConvBlock, _as_args, max_pool

NUM_CLASSES = 10


class MNISTAudio(nn.Module):
    conv_block_one_one_args: Any
    conv_block_one_two_args: Any
    conv_block_two_one_args: Any
    conv_block_two_two_args: Any
    hidden_dim: int
    conv_batch_norm: bool = True
    max_pool_one_kernel_size: Any = (2, 2)
    max_pool_two_kernel_size: Any = (3, 3)

    def get_embedding_size(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, audio: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if audio.ndim == 3:  # (B, H, W) → NHWC
            x = audio[..., None]
        else:
            x = audio
        x = ConvBlock(
            _as_args(self.conv_block_one_one_args),
            _as_args(self.conv_block_one_two_args),
            batch_norm=self.conv_batch_norm,
            name="block_one",
        )(x, train=train)
        x = max_pool(x, self.max_pool_one_kernel_size)
        x = ConvBlock(
            _as_args(self.conv_block_two_one_args),
            _as_args(self.conv_block_two_two_args),
            batch_norm=self.conv_batch_norm,
            name="block_two",
        )(x, train=train)
        x = max_pool(x, self.max_pool_two_kernel_size)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.hidden_dim, name="fc")(x)


class MNISTImage(nn.Module):
    conv_block_one_one_args: Any
    conv_block_one_two_args: Any
    conv_block_two_one_args: Any
    conv_block_two_two_args: Any
    hidden_dim: int
    conv_batch_norm: bool = True
    max_pool_kernel_size: Any = (2, 2)

    def get_embedding_size(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = image if image.ndim == 4 else image[..., None]
        x = ConvBlock(
            _as_args(self.conv_block_one_one_args),
            _as_args(self.conv_block_one_two_args),
            batch_norm=self.conv_batch_norm,
            name="block_one",
        )(x, train=train)
        x = max_pool(x, self.max_pool_kernel_size)
        x = ConvBlock(
            _as_args(self.conv_block_two_one_args),
            _as_args(self.conv_block_two_two_args),
            batch_norm=self.conv_batch_norm,
            name="block_two",
        )(x, train=train)
        x = max_pool(x, self.max_pool_kernel_size)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.hidden_dim, name="fc")(x)


class _DenseParams(nn.Module):
    """kernel/bias with nn.Dense's exact param naming, no compute — lets
    the caller choose the execution path (plain XLA vs fused Pallas)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class AVMNIST(nn.Module):
    """Late-fusion audio+image classifier."""

    audio_encoder: nn.Module
    image_encoder: nn.Module
    hidden_dim: int
    dropout: float = 0.0
    fusion_fn: str = "concat"

    @nn.compact
    def __call__(
        self,
        A: Optional[jnp.ndarray] = None,
        I: Optional[jnp.ndarray] = None,
        *,
        is_embd_A: bool = False,
        is_embd_I: bool = False,
        train: bool = False,
        fused_head: Optional[bool] = None,
    ) -> jnp.ndarray:
        assert A is not None or I is not None
        assert not (is_embd_A and is_embd_I)
        if self.fusion_fn.lower() != "concat":
            raise ValueError(f"Unknown fusion function: {self.fusion_fn}")

        # reference substitutes a ZERO EMBEDDING for an absent modality
        # (avmnist.py:261-262) — meaningful with is_embd_X=True (the C-MAM
        # substitution path); with is_embd_X=False the encoder sees the
        # embedding-shaped zeros and fails, exactly as it does there
        if A is None:
            A = jnp.zeros(
                (I.shape[0], self.audio_encoder.hidden_dim), I.dtype
            )
        if I is None:
            I = jnp.zeros(
                (A.shape[0], self.image_encoder.hidden_dim), A.dtype
            )
        audio = A if is_embd_A else self.audio_encoder(A, train=train)
        image = I if is_embd_I else self.image_encoder(I, train=train)
        fused = jnp.concatenate([audio, image], axis=1)

        # Head params declared explicitly (same names/shapes as nn.Dense —
        # checkpoints are interchangeable) so the eval path can run the
        # whole MLP as ONE Pallas kernel. Measured (v5e, scripts/
        # bench_kernels.py): fwd 0.776 ms vs XLA 1.212 ms at B=1024
        # (-36%), 1.003 vs 1.119 at B=128; the training path stays XLA
        # because fwd+bwd with the recompute VJP is slower there.
        dims = (fused.shape[-1], self.hidden_dim, self.hidden_dim // 2,
                NUM_CLASSES)
        names = ("fc_fusion", "fc_intermediate", "fc_out")
        ws, bs = [], []
        for name, d_in, d_out in zip(names, dims[:-1], dims[1:]):
            k, b = _DenseParams(d_in, d_out, name=name)()
            ws.append(k)
            bs.append(b)

        import jax as _jax

        # fused_head=None → auto (eval only). Callers that differentiate
        # through an eval-mode forward (the CMAM frozen-teacher step) pass
        # False: the kernel's recompute VJP loses in the fwd+bwd regime.
        use_fused = (not train) if fused_head is None else fused_head
        if use_fused and _jax.default_backend() == "tpu":
            # fused_mlp itself falls back to XLA under ops.xla_only() (the
            # serving-export escape hatch) and on non-TPU backends
            from mmtpu.ops.fused_mlp import fused_mlp

            return fused_mlp(fused, tuple(ws), tuple(bs))

        x = nn.relu(fused @ ws[0] + bs[0])
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(x @ ws[1] + bs[1])
        return x @ ws[2] + bs[2]

    def encode(self, A: jnp.ndarray, I: jnp.ndarray, train: bool = False):
        """Per-modality embeddings (reference get_embeddings :362-401)."""
        return (
            self.audio_encoder(A, train=train),
            self.image_encoder(I, train=train),
        )


class MonomodalEncoder(nn.Module):
    """Encoder + linear head for monomodal pretraining
    (reference: train_monomodal.py:64-95)."""

    encoder: nn.Module
    output_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        embd = self.encoder(x, train=train)
        return nn.Dense(self.num_classes, name="head")(embd)
