"""RedCore training step with on-device adaptive β weighting.

Reference (models/msa/redcore.py:153-300): CE on the fused + 3 aux
classifiers, KLD terms over the VAE posteriors gated by the missing index,
masked MSE between generated and true features with an EMA of per-modality
losses driving the adaptive β rebalance every `interval_i` steps (η grows
×eta_ext every 500 steps). The reference keeps β/EMAs as Python floats
(one host sync per step); here they ride in a `RedCoreSchedState` pytree so
the whole schedule compiles into the step.

Faithful reference quirk, verified not a porting gap: the reference's loss
(redcore.py:283) is ce + KLDs + aux ces + mse — it contains NO term over
netAE/netAE_cycle outputs (recon_fusion/recon_cycle/latent are returned
but unused; netC classifies feature_fusion_r directly, redcore.py:123),
so those AE subtrees train with zero gradient in the reference too. They
are reproduced for checkpoint/output-schema parity, not invented here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct

from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.state import TrainState
from mmtpu.train.step import apply_missing_mask, masked_mean


class RedCoreSchedState(struct.PyTreeNode):
    loss_ema: jnp.ndarray   # (3,) per-modality EMA
    beta: jnp.ndarray       # (3,)
    eta: jnp.ndarray        # scalar
    iter_count: jnp.ndarray  # scalar int

    @classmethod
    def create(cls, eta: float = 0.001) -> "RedCoreSchedState":
        return cls(
            loss_ema=jnp.zeros((3,), jnp.float32),
            beta=jnp.ones((3,), jnp.float32),
            eta=jnp.asarray(eta, jnp.float32),
            iter_count=jnp.zeros((), jnp.int32),
        )


@dataclasses.dataclass
class RedCoreTask:
    model: Any
    loss_group: LossFunctionGroup
    loss_beta: float = 0.95
    interval_i: int = 2
    eta_ext: float = 1.5
    lambda_one: float = 0.0008
    label_key: str = "labels"


def _masked(batch, mod):
    return apply_missing_mask(batch[mod], batch.get(f"{mod}_mask"))


def _masked_ce(logits, labels, sample_mask):
    import optax

    per = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels.astype(jnp.int32)
    )
    return masked_mean(per, sample_mask)


def make_redcore_train_step(task: RedCoreTask) -> Callable:
    def step(
        state: TrainState,
        sched: RedCoreSchedState,
        batch: Dict[str, Any],
        rng,
    ):
        iA = batch.get("audio_mask", jnp.ones(batch["labels"].shape[0]))
        iV = batch.get("video_mask", jnp.ones_like(iA))
        iT = batch.get("text_mask", jnp.ones_like(iA))
        # batch_size = REAL rows (the reference's ragged batches have no
        # padding; dividing by the padded size would shrink the KLD/MSE
        # terms on the tail batch relative to the reference)
        _sm = batch.get("sample_mask")
        B = iA.shape[0] if _sm is None else jnp.maximum(jnp.sum(_sm), 1.0)

        def loss_fn(params):
            from mmtpu.models.norm import batch_mask

            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            # padded tail rows stay out of BatchNorm statistics (models/norm)
            with batch_mask(batch.get("sample_mask")):
                out = state.apply_fn(
                    variables,
                    _masked(batch, "audio"), _masked(batch, "video"),
                    _masked(batch, "text"),
                    iA, iV, iT,
                    train=True,
                    rngs={"dropout": rng, "sample": jax.random.fold_in(rng, 1)},
                    mutable=["batch_stats"] if state.batch_stats else False,
                )
            if state.batch_stats:
                res, updates = out
                new_stats = updates["batch_stats"]
            else:
                res, new_stats = out, state.batch_stats

            labels = batch[task.label_key]
            sm = batch.get("sample_mask")
            ce_w = (
                task.loss_group["cross_entropy"].weight
                if "cross_entropy" in task.loss_group else 1.0
            )
            # padded tail rows excluded (zeroed inputs + label 0 otherwise
            # bias every aux classifier toward class 0)
            ce = ce_w * _masked_ce(res["logits"], labels, sm)
            ce_A = ce_w * _masked_ce(res["logits_A"], labels, sm)
            ce_V = ce_w * _masked_ce(res["logits_V"], labels, sm)
            ce_T = ce_w * _masked_ce(res["logits_T"], labels, sm)

            def kld(mu, lv, idx):
                return (
                    -task.lambda_one
                    * jnp.sum((1.0 + lv - mu**2 - jnp.exp(lv)) * idx[:, None])
                    / B
                )

            kld_total = (
                kld(res["fmu_A"], res["flog_var_A"], iA)
                + kld(res["fmu_V"], res["flog_var_V"], iV)
                + kld(res["fmu_T"], res["flog_var_T"], iT)
            )

            def masked_mse(gen, feat, idx):
                # faithful quirk (reference redcore.py:238-253): torch's
                # mean-reduced MSE over the FULL batch is divided AGAIN by
                # the present-sample count, so a modality's term shrinks
                # with its presence frequency. Reproduced, not "fixed" —
                # changing it would change the trained loss surface.
                # (Two documented deviations: the full-batch mean uses the
                # REAL row count, not the padded one — reference batches
                # are ragged — and each modality divides by its OWN count;
                # the reference's batch_size_V = sum(missing_index_A) at
                # redcore.py:233 is a copy-paste typo.)
                diff = (gen - feat) * idx[:, None]
                denom = jnp.maximum(jnp.sum(idx), 1.0)
                return jnp.sum(diff**2) / (B * gen.shape[-1]) / denom

            mse_A = masked_mse(res["gen_A"], res["feature_A_miss"], iA)
            mse_V = masked_mse(res["gen_V"], res["feature_V_miss"], iV)
            mse_T = masked_mse(res["gen_T"], res["feature_T_miss"], iT)

            mse_weight = (
                task.loss_group["mse"].weight if "mse" in task.loss_group else 1.0
            )
            loss_mse = mse_weight * (
                sched.beta[0] * mse_A + sched.beta[1] * mse_V + sched.beta[2] * mse_T
            )
            total = ce + kld_total + ce_A + ce_V + ce_T + loss_mse
            return total, (res, new_stats, jnp.stack([mse_A, mse_V, mse_T]), ce)

        (loss, (res, new_stats, mse_vec, ce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)

        # -- adaptive β schedule (on device) ---------------------------------
        # Faithful quirks from the reference (redcore.py:260-277), kept
        # bit-for-bit rather than "improved":
        #  - ra = (avg - total)/avg is a SCALAR identically -2 whenever the
        #    EMA sum is positive, so rebalance() always clips to 0.1 and
        #    normalizes β to [1/√3]*3 — the reference's adaptive-β never
        #    actually rebalances (its ra = float(...) is the same scalar);
        #  - iter_count starts at 0 and 0 % 500 == 0, so η grows by η_ext
        #    on the very first step, exactly as the reference does.
        b = task.loss_beta
        upd = jnp.where(mse_vec != 0.0, mse_vec, sched.loss_ema)
        ema = (1.0 - b) * sched.loss_ema + b * upd
        eta = jnp.where(
            sched.iter_count % 500 == 0, sched.eta * task.eta_ext, sched.eta
        )
        total3 = jnp.sum(ema)
        avg3 = total3 / 3.0
        ra = (avg3 - total3) / jnp.maximum(avg3, 1e-12)

        def rebalance(beta):
            nb = jnp.maximum(beta * eta * ra, 0.1)
            return nb / jnp.linalg.norm(nb)

        beta = jnp.where(
            sched.iter_count % task.interval_i == 0,
            rebalance(sched.beta),
            sched.beta,
        )
        new_sched = sched.replace(
            loss_ema=ema, beta=beta, eta=eta, iter_count=sched.iter_count + 1
        )

        out = {
            "loss": loss,
            "preds": jnp.argmax(res["logits"], axis=-1),
            "labels": batch[task.label_key],
        }
        for k in ("pattern_id", "sample_mask"):
            if k in batch:
                out[k] = batch[k]
        return new_state, new_sched, out

    return jax.jit(step, donate_argnums=(0, 1))


def make_redcore_eval_step(task: RedCoreTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any]):
        iA = batch.get("audio_mask", jnp.ones(batch["labels"].shape[0]))
        iV = batch.get("video_mask", jnp.ones_like(iA))
        iT = batch.get("text_mask", jnp.ones_like(iA))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        res = state.apply_fn(
            variables,
            _masked(batch, "audio"), _masked(batch, "video"), _masked(batch, "text"),
            iA, iV, iT, train=False,
        )
        labels = batch[task.label_key]
        loss = _masked_ce(res["logits"], labels, batch.get("sample_mask"))
        out = {
            "loss": loss,
            "preds": jnp.argmax(res["logits"], axis=-1),
            "labels": labels,
        }
        for k in ("pattern_id", "sample_mask"):
            if k in batch:
                out[k] = batch[k]
        return out

    return jax.jit(step)
