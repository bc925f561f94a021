"""MulT — Multimodal Transformer (reference: models/msa/mult.py:18-370).

Architecture: per-modality 1-D conv projections to a shared attention dim
(SeqEncoder, networks/seq_encoder.py), gated crossmodal transformer stacks
text↔audio and text↔video (first layer cross-attends, later layers
self-attend — our GatedTransformer), masked mean-pooling over valid steps,
concat of the four crossmodal streams → residual projection head → output.

The reference's MulT is unregistered in its CLI resolvers (SURVEY §2.3
"dead from the CLI") and couples a domain discriminator through its custom
GatedTransformer; the discriminator is the optional `use_discriminator`
head here (a small binary MLP over pooled crossmodal features) so the
architecture surface is complete while the classifier path stays pure.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.models.seq_extras import GatedTransformer


class ConvProjection(nn.Module):
    """1-D conv over the sequence (torch Conv1d(k, pad=(k-1)//2) equivalent)."""

    attention_dim: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.ksize - 1) // 2
        return nn.Conv(
            self.attention_dim, kernel_size=(self.ksize,),
            padding=((pad, pad),), name="conv",
        )(x)


def masked_mean_pool(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    if lengths is None:
        return jnp.mean(x, axis=1)
    steps = jnp.arange(x.shape[1])[None, :]
    mask = (steps < lengths[:, None]).astype(x.dtype)[..., None]
    return jnp.sum(x * mask, axis=1) / jnp.maximum(
        lengths[:, None].astype(x.dtype), 1.0
    )


class CrossmodalStack(nn.Module):
    """source→target crossmodal attention then self-attention layers."""

    embed_dim: int
    num_heads: int
    layers: int
    attention_dropout: float
    relu_dropout: float
    residual_dropout: float
    embd_dropout: float
    attention_mask: bool

    @nn.compact
    def __call__(self, target, source, train: bool = False):
        return GatedTransformer(
            input_dim=target.shape[-1],
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            layers=self.layers,
            attn_dropout=self.attention_dropout,
            relu_dropout=self.relu_dropout,
            res_dropout=self.residual_dropout,
            embed_dropout=self.embd_dropout,
            attn_mask=self.attention_mask,
            name="stack",
        )(target, source, train=train)


class MultModalTransformer(nn.Module):
    orig_dim_a: int
    orig_dim_t: int
    orig_dim_v: int
    attention_dim: int
    output_dim: int
    num_heads: int = 5
    num_layers: int = 5
    attention_dropout: float = 0.1
    # accepted-but-unread in the REFERENCE too: its _get_network ignores
    # the modality type ("unused, kept for compatibility", msa/mult.py:161)
    # and hardcodes attention_dropout for all four stacks — reproduced
    attention_dropout_a: float = 0.0
    attention_dropout_v: float = 0.0
    relu_dropout: float = 0.1
    embd_dropout: float = 0.25
    residual_dropout: float = 0.1
    output_dropout: float = 0.0
    attention_mask: bool = True
    a_ksize: int = 3
    t_ksize: int = 3
    v_ksize: int = 3
    use_discriminator: bool = False
    lambda_d: float = 0.1
    clip_grad_norm: float = 0.8

    @nn.compact
    def __call__(
        self,
        A: jnp.ndarray,
        V: jnp.ndarray,
        T: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        a_seq = ConvProjection(self.attention_dim, self.a_ksize, name="proj_a")(A)
        v_seq = ConvProjection(self.attention_dim, self.v_ksize, name="proj_v")(V)
        t_seq = ConvProjection(self.attention_dim, self.t_ksize, name="proj_t")(T)

        def stack(name):
            return CrossmodalStack(
                self.attention_dim, self.num_heads, self.num_layers,
                self.attention_dropout, self.relu_dropout,
                self.residual_dropout, self.embd_dropout, self.attention_mask,
                name=name,
            )

        a2t = stack("text_audio_t")(t_seq, a_seq, train=train)  # text attends audio
        t2a = stack("text_audio_a")(a_seq, t_seq, train=train)
        v2t = stack("text_video_t")(t_seq, v_seq, train=train)
        t2v = stack("text_video_v")(v_seq, t_seq, train=train)

        pooled = jnp.concatenate(
            [
                masked_mean_pool(a2t, lengths),
                masked_mean_pool(t2a, lengths),
                masked_mean_pool(v2t, lengths),
                masked_mean_pool(t2v, lengths),
            ],
            axis=-1,
        )  # (B, 4*attention_dim)

        h = nn.relu(nn.Dense(4 * self.attention_dim, name="projection_one")(pooled))
        h = nn.Dropout(self.output_dropout, deterministic=not train)(h)
        h = nn.Dense(4 * self.attention_dim, name="projection_two")(h)
        h = h + pooled  # residual (reference fusion head)
        logits = nn.Dense(self.output_dim, name="output_layer")(h)

        if self.use_discriminator:
            # Domain discriminator over pooled crossmodal features (which
            # stream — text-conditioned vs audio-conditioned — produced
            # it). The reference declares this head but never trains it:
            # its lambda_d wiring is a self-assignment no-op (msa/mult.py:
            # 113-115) and the model is unregistered from the CLI. Here
            # the head is actually trainable: its weighted BCE rides the
            # return value as `aux_loss`, which ClassificationTask adds to
            # the classification loss — no custom step needed.
            disc_in = jnp.concatenate(
                [masked_mean_pool(a2t, lengths), masked_mean_pool(t2a, lengths)],
                axis=0,
            )
            disc = nn.Dense(1, name="discriminator")(
                nn.relu(nn.Dense(self.attention_dim, name="disc_hidden")(disc_in))
            ).reshape(-1)
            disc_labels = jnp.concatenate(
                [jnp.ones(a2t.shape[0]), jnp.zeros(t2a.shape[0])]
            )
            from mmtpu.models.norm import current_mask

            import optax

            per = optax.sigmoid_binary_cross_entropy(disc, disc_labels)
            sm = current_mask()
            if sm is not None:
                # padded tail rows (batch padding) carry no signal; the
                # mask covers each pooled copy of the batch
                m = jnp.concatenate([sm, sm]).astype(per.dtype)
                disc_loss = jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
            else:
                disc_loss = jnp.mean(per)
            return {"logits": logits, "aux_loss": self.lambda_d * disc_loss}
        return logits
