"""CMAM training: frozen-teacher two-model step.

Reference: models/cmams.py train_step (:173-250) and train_cmam.py — teacher
embedding computed under no_grad (:208-212), reconstruction via the CMAM,
classification of the reconstructed embedding pushed back through the frozen
base model (:229-237), composite CMAMLoss. Optimizer covers CMAM params only
(train_cmam.py:208).

Pure-jit version: teacher params are captured as constants (stop_gradient);
one compiled step does teacher-encode + reconstruct + teacher-classify +
loss + update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from mmtpu.train.cmam_loss import CMAMLoss
from mmtpu.train.state import TrainState

# model_type → (modality → forward-kwarg letter). Keys are the lowercased
# spellings the reference YAML corpus actually uses for CMAM base models:
# resolver names ("utt-fusion") AND class names ("UttFusionModel", e.g.
# configs/mosei/centralised/cmams/audio_cmams/audio_to_text_cosine.yaml:12).
_TRIMODAL = {"audio": "A", "video": "V", "text": "T"}
FORWARD_KWARGS: Dict[str, Dict[str, str]] = {
    "avmnist": {"audio": "A", "image": "I"},
    "utt-fusion": _TRIMODAL,
    "utt_fusion": _TRIMODAL,
    "uttfusionmodel": _TRIMODAL,
    "mmimdb": {"image": "I", "text": "T"},
}


@dataclasses.dataclass
class CMAMTask:
    cmam_model: Any
    base_model: Any
    base_variables: Dict[str, Any]  # frozen teacher
    base_model_type: str
    input_modalities: Sequence[str]
    target_modality: str
    loss: CMAMLoss
    labels_key: str = "labels"
    cls_from_rec: bool = True
    # the reference uses the BASE model's logits_transform for predictions
    # (cmams.py:239-243) — sigmoid+threshold for the multilabel MM-IMDb
    # base (mmimdb.py:152-154), argmax otherwise
    multilabel: bool = False
    binary_threshold: float = 0.5

    def predictions(self, logits: jnp.ndarray) -> jnp.ndarray:
        if self.multilabel:
            return (
                jax.nn.sigmoid(logits) > self.binary_threshold
            ).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1)

    def _kwarg_letters(self) -> Dict[str, str]:
        return FORWARD_KWARGS[self.base_model_type.lower()]

    @staticmethod
    def masked(batch, mod: str) -> jnp.ndarray:
        """Pattern-masked modality, like the reference's batch[Modality.X]."""
        from mmtpu.train.step import apply_missing_mask

        return apply_missing_mask(batch[mod], batch.get(f"{mod}_mask"))

    def teacher_embedding(self, batch) -> jnp.ndarray:
        """Frozen target-modality embedding from the base model's encoder."""
        enc_name = f"{self.target_modality}_encoder"
        x = self.masked(batch, self.target_modality)
        # AVMNIST-style models expose per-modality encoders as submodules;
        # UttFusion exposes netA/netV/netT.
        variables = self.base_variables
        if enc_name in variables["params"]:
            sub_vars = {
                "params": variables["params"][enc_name],
            }
            if variables.get("batch_stats") and enc_name in variables["batch_stats"]:
                sub_vars["batch_stats"] = variables["batch_stats"][enc_name]
            encoder = getattr(self.base_model, enc_name)
            out = encoder.apply(sub_vars, x, train=False)
        else:
            net = {"audio": "netA", "video": "netV", "text": "netT"}[
                self.target_modality
            ]
            sub_vars = {"params": variables["params"][net]}
            if variables.get("batch_stats") and net in variables["batch_stats"]:
                sub_vars["batch_stats"] = variables["batch_stats"][net]
            encoder = getattr(self.base_model, net)
            out = encoder.apply(sub_vars, x, train=False)
        return jax.lax.stop_gradient(out)

    def teacher_classify(self, rec_embd, batch) -> jnp.ndarray:
        """Push the reconstructed embedding through the frozen base model."""
        letters = self._kwarg_letters()
        kwargs: Dict[str, Any] = {}
        for mod in letters:
            letter = letters[mod]
            if mod == self.target_modality:
                kwargs[letter] = rec_embd
                kwargs[f"is_embd_{letter}"] = True
            elif mod in batch:
                kwargs[letter] = self.masked(batch, mod)
        if self.base_model_type.lower() == "avmnist":
            # gradients flow through this eval-mode forward (wrt rec_embd),
            # so force the XLA head — the fused kernel loses under fwd+bwd
            kwargs["fused_head"] = False
        return self.base_model.apply(self.base_variables, train=False, **kwargs)


def make_cmam_train_step(task: CMAMTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any], rng):
        target_embd = task.teacher_embedding(batch)

        def loss_fn(params):
            from mmtpu.models.norm import batch_mask

            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            inputs = {m: task.masked(batch, m) for m in task.input_modalities}
            # padded tail rows stay out of BatchNorm statistics (models/norm)
            with batch_mask(batch.get("sample_mask")):
                out = state.apply_fn(
                    variables,
                    inputs,
                    train=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"] if state.batch_stats else False,
                )
            if state.batch_stats:
                rec, updates = out
                new_stats = updates["batch_stats"]
            else:
                rec, new_stats = out, state.batch_stats
            cls_logits = (
                task.teacher_classify(rec, batch) if task.cls_from_rec else None
            )
            terms = task.loss(
                rec,
                target_embd,
                cls_logits=cls_logits,
                cls_labels=batch.get(task.labels_key) if task.cls_from_rec else None,
                sample_mask=batch.get("sample_mask"),
            )
            return terms["total_loss"], (rec, cls_logits, terms, new_stats)

        (loss, (rec, cls_logits, terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        out = {
            "loss": loss,
            "terms": {k: v for k, v in terms.items()},
            "rec_embd": rec,
            "target_embd": target_embd,
            "labels": batch.get(task.labels_key),
        }
        if cls_logits is not None:
            out["preds"] = task.predictions(cls_logits)
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if "sample_mask" in batch:
            out["sample_mask"] = batch["sample_mask"]
        return new_state, out

    return jax.jit(step, donate_argnums=(0,))


def make_cmam_eval_step(task: CMAMTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any]):
        target_embd = task.teacher_embedding(batch)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        inputs = {m: task.masked(batch, m) for m in task.input_modalities}
        rec = state.apply_fn(variables, inputs, train=False)
        cls_logits = task.teacher_classify(rec, batch) if task.cls_from_rec else None
        terms = task.loss(
            rec,
            target_embd,
            cls_logits=cls_logits,
            cls_labels=batch.get(task.labels_key) if task.cls_from_rec else None,
            sample_mask=batch.get("sample_mask"),
        )
        out = {
            "loss": terms["total_loss"],
            "terms": terms,
            "rec_embd": rec,
            "target_embd": target_embd,
            "labels": batch.get(task.labels_key),
        }
        if cls_logits is not None:
            out["preds"] = task.predictions(cls_logits)
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if "sample_mask" in batch:
            out["sample_mask"] = batch["sample_mask"]
        return out

    return jax.jit(step)


@dataclasses.dataclass
class DualCMAMTask(CMAMTask):
    """Dual-target C-MAM (reference cmams.py:626-780): one input modality,
    two reconstructed target embeddings, loss = sum of the two CMAMLoss
    dicts, classification through the frozen base model with BOTH
    reconstructions substituted."""

    target_modality_two: str = "text"

    def teacher_embedding_for(self, batch, modality: str) -> jnp.ndarray:
        saved = self.target_modality
        try:
            object.__setattr__(self, "target_modality", modality)
            return self.teacher_embedding(batch)
        finally:
            object.__setattr__(self, "target_modality", saved)

    def teacher_classify_dual(self, rec_one, rec_two, batch) -> jnp.ndarray:
        letters = self._kwarg_letters()
        kwargs: Dict[str, Any] = {}
        for mod, letter in letters.items():
            if mod == self.target_modality:
                kwargs[letter] = rec_one
                kwargs[f"is_embd_{letter}"] = True
            elif mod == self.target_modality_two:
                kwargs[letter] = rec_two
                kwargs[f"is_embd_{letter}"] = True
            elif mod in batch:
                kwargs[letter] = self.masked(batch, mod)
        if self.base_model_type.lower() == "avmnist":
            kwargs["fused_head"] = False  # see teacher_classify
        return self.base_model.apply(self.base_variables, train=False, **kwargs)


def make_dual_cmam_train_step(task: DualCMAMTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any], rng):
        tgt_one = task.teacher_embedding_for(batch, task.target_modality)
        tgt_two = task.teacher_embedding_for(batch, task.target_modality_two)

        def loss_fn(params):
            from mmtpu.models.norm import batch_mask

            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            x = task.masked(batch, task.input_modalities[0])
            # padded tail rows stay out of BatchNorm statistics (models/norm)
            with batch_mask(batch.get("sample_mask")):
                out = state.apply_fn(
                    variables, x, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"] if state.batch_stats else False,
                )
            if state.batch_stats:
                (rec_one, rec_two), updates = out
                new_stats = updates["batch_stats"]
            else:
                (rec_one, rec_two), new_stats = out, state.batch_stats
            cls_logits = (
                task.teacher_classify_dual(rec_one, rec_two, batch)
                if task.cls_from_rec else None
            )
            labels = batch.get(task.labels_key) if task.cls_from_rec else None
            # Faithful reference quirk (models/cmams.py:707-726): BOTH
            # CMAMLoss calls receive the same cls_logits/cls_labels and
            # both totals are summed, so the classification term is
            # effectively counted at 2x cls_weight. Reproduced, not
            # "fixed" — halving it would change the trained loss surface
            # vs the reference.
            terms_one = task.loss(rec_one, tgt_one, cls_logits=cls_logits,
                                  cls_labels=labels,
                                  sample_mask=batch.get("sample_mask"))
            terms_two = task.loss(rec_two, tgt_two, cls_logits=cls_logits,
                                  cls_labels=labels,
                                  sample_mask=batch.get("sample_mask"))
            total = terms_one["total_loss"] + terms_two["total_loss"]
            terms = {f"rec_{k}_one": v for k, v in terms_one.items()
                     if k != "total_loss"}
            terms.update({f"rec_{k}_two": v for k, v in terms_two.items()
                          if k != "total_loss"})
            return total, (rec_one, rec_two, cls_logits, terms, new_stats)

        (loss, (rec_one, rec_two, cls_logits, terms, new_stats)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        out = {
            "loss": loss,
            "terms": terms,
            "rec_embd": rec_one,
            "rec_embd_two": rec_two,
            "target_embd": tgt_one,
            "target_embd_two": tgt_two,
            "labels": batch.get(task.labels_key),
        }
        if cls_logits is not None:
            out["preds"] = task.predictions(cls_logits)
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if "sample_mask" in batch:
            out["sample_mask"] = batch["sample_mask"]
        return new_state, out

    return jax.jit(step, donate_argnums=(0,))


def make_dual_cmam_eval_step(task: DualCMAMTask) -> Callable:
    def step(state: TrainState, batch: Dict[str, Any]):
        tgt_one = task.teacher_embedding_for(batch, task.target_modality)
        tgt_two = task.teacher_embedding_for(batch, task.target_modality_two)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        x = task.masked(batch, task.input_modalities[0])
        rec_one, rec_two = state.apply_fn(variables, x, train=False)
        cls_logits = (
            task.teacher_classify_dual(rec_one, rec_two, batch)
            if task.cls_from_rec else None
        )
        labels = batch.get(task.labels_key) if task.cls_from_rec else None
        terms_one = task.loss(rec_one, tgt_one, cls_logits=cls_logits,
                              cls_labels=labels,
                              sample_mask=batch.get("sample_mask"))
        terms_two = task.loss(rec_two, tgt_two, cls_logits=cls_logits,
                              cls_labels=labels,
                              sample_mask=batch.get("sample_mask"))
        out = {
            "loss": terms_one["total_loss"] + terms_two["total_loss"],
            "rec_embd": rec_one,
            "rec_embd_two": rec_two,
            "target_embd": tgt_one,
            "target_embd_two": tgt_two,
            "labels": batch.get(task.labels_key),
        }
        if cls_logits is not None:
            out["preds"] = task.predictions(cls_logits)
        if "pattern_id" in batch:
            out["pattern_id"] = batch["pattern_id"]
        if "sample_mask" in batch:
            out["sample_mask"] = batch["sample_mask"]
        return out

    return jax.jit(step)
