"""Inference export: `jax.export` artifacts and in-process predictors.

The artifact is one file:

    MMTPU-SERVE-1\\n | uint64 meta-length (little-endian) | meta JSON | blob

where `blob` is the serialized `jax.export.Exported` (StableHLO with the
trained parameters baked in as constants) and `meta` records the input
signature, output names, and task flags needed to call it blind. Artifacts
are lowered for BOTH "cpu" and "tpu" by default and use a symbolic batch
dimension, so a single export runs on any host at any batch size — the
TPU-native analogue of a TorchScript/ONNX deployment bundle.

Pallas note: shape-dispatched kernels (ops/lstm.py, ops/fused_mlp.py) are
traced through their pure-XLA fallbacks during export (`mmtpu.ops.xla_only`)
— Pallas TPU kernels cannot lower for the cpu platform and their admission
checks compare batch dims that are symbolic here. The fallbacks are
bit-exact, so artifact outputs match the in-process forward.

No reference counterpart (MML_Suite has no inference entry point); this is
a beyond-reference subsystem.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = b"MMTPU-SERVE-1\n"


def make_serving_fn(task, variables) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Pure inference closure: positional modality arrays (in
    `task.input_keys` order) → {"logits", "preds", "probs"}.

    Eval-mode forward (dropout off, BN running averages), parameters closed
    over — jit or export the result directly. Missing-modality serving is
    input-side: a zeroed array is exactly what the training-time mask
    multiply produces (train/step.apply_missing_mask)."""

    def fn(*inputs):
        batch = {k: x for k, x in zip(task.input_keys, inputs)}
        logits = task.apply(variables, batch, train=False)
        probs = (
            jax.nn.sigmoid(logits)
            if getattr(task, "multilabel", False)
            else jax.nn.softmax(logits, axis=-1)
        )
        return {
            "logits": logits,
            "preds": task.predictions(logits),
            "probs": probs,
        }

    return fn


def _resolve_inputs(input_keys: Sequence[str], args, kwargs):
    """Positional-XOR-keyword input resolution shared by Predictor and
    ServedModel — one place to evolve the calling contract."""
    inputs = list(args)
    if kwargs:
        if inputs:
            raise TypeError("pass inputs positionally OR by keyword")
        try:
            inputs = [kwargs[k] for k in input_keys]
        except KeyError as e:
            raise KeyError(
                f"missing input {e}; expected {tuple(input_keys)}"
            ) from None
    return [jnp.asarray(x) for x in inputs]


@dataclasses.dataclass
class Predictor:
    """In-process jitted predictor with host-side outputs.

    predict(audio=..., image=...) → dict of numpy arrays. Keyword names are
    the task's input_keys; positional calls follow the same order."""

    task: Any
    variables: Any

    def __post_init__(self) -> None:
        self._fn = jax.jit(make_serving_fn(self.task, self.variables))

    @property
    def input_keys(self) -> Sequence[str]:
        return tuple(str(k) for k in self.task.input_keys)

    def __call__(self, *args, **kwargs) -> Dict[str, np.ndarray]:
        out = self._fn(*_resolve_inputs(self.input_keys, args, kwargs))
        return {k: np.asarray(v) for k, v in out.items()}


def _input_specs(input_keys, example_batch, symbolic_batch: bool):
    from jax import export as jexport

    specs, shapes, dtypes = [], [], []
    b = jexport.symbolic_shape("b")[0] if symbolic_batch else None
    for key in input_keys:
        arr = np.asarray(example_batch[key])
        shape = ((b,) if symbolic_batch else (arr.shape[0],)) + arr.shape[1:]
        specs.append(jax.ShapeDtypeStruct(shape, arr.dtype))
        shapes.append(["b" if symbolic_batch else arr.shape[0], *arr.shape[1:]])
        dtypes.append(str(arr.dtype))
    return specs, shapes, dtypes


def _export_fn(
    fn,
    input_keys: Sequence[str],
    example_batch: Dict[str, Any],
    path: str | Path,
    meta: Dict[str, Any],
    platforms: Sequence[str],
    symbolic_batch: bool,
) -> Path:
    """Shared artifact writer: trace `fn` under the XLA-only override,
    serialize, and write MAGIC|meta|blob atomically."""
    from jax import export as jexport

    import mmtpu.ops as ops

    specs, shapes, dtypes = _input_specs(input_keys, example_batch,
                                         symbolic_batch)
    with ops.xla_only():
        exported = jexport.export(jax.jit(fn), platforms=tuple(platforms))(
            *specs
        )
    blob = exported.serialize()
    meta = {
        "format": "mmtpu-serve-1",
        "input_keys": [str(k) for k in input_keys],
        "input_shapes": shapes,
        "input_dtypes": dtypes,
        "platforms": list(platforms),
        "symbolic_batch": bool(symbolic_batch),
        "jax_version": jax.__version__,
        **meta,
    }
    meta_bytes = json.dumps(meta).encode()

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)
    tmp.replace(path)
    return path


def export_task(
    task,
    variables,
    example_batch: Dict[str, Any],
    path: str | Path,
    *,
    platforms: Sequence[str] = ("cpu", "tpu"),
    symbolic_batch: bool = True,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> Path:
    """Export a trained classification task to a serving artifact.

    example_batch supplies per-input shapes/dtypes (only trailing dims are
    kept when symbolic_batch=True). Returns the written path."""
    meta = {
        "task_type": "classification",
        "outputs": ["logits", "preds", "probs"],
        "multilabel": bool(getattr(task, "multilabel", False)),
        "binary_threshold": float(getattr(task, "binary_threshold", 0.5)),
        "model": type(task.model).__name__,
        **(extra_meta or {}),
    }
    return _export_fn(
        make_serving_fn(task, variables), task.input_keys, example_batch,
        path, meta, platforms, symbolic_batch,
    )


def make_cmam_serving_fn(task, cmam_variables) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Missing-modality inference closure for a trained C-MAM.

    Positional inputs = the AVAILABLE modalities (`task.input_modalities`
    order). The missing target modality's embedding is imputed by the CMAM
    and classification runs through the frozen base model with the
    reconstruction substituted (train/cmam_step.CMAMTask.teacher_classify)
    — the thesis's deployment scenario: serve a multimodal model when one
    modality is absent at request time. Dual C-MAM tasks (one input, two
    reconstructed targets) are handled transparently."""
    from mmtpu.train.cmam_step import DualCMAMTask

    dual = isinstance(task, DualCMAMTask)

    def fn(*inputs):
        batch = {m: x for m, x in zip(task.input_modalities, inputs)}
        if dual:
            rec_one, rec_two = task.cmam_model.apply(
                cmam_variables, batch[task.input_modalities[0]], train=False
            )
            logits = task.teacher_classify_dual(rec_one, rec_two, batch)
            rec = {"rec_embd": rec_one, "rec_embd_two": rec_two}
        else:
            rec_embd = task.cmam_model.apply(
                cmam_variables,
                {m: batch[m] for m in task.input_modalities},
                train=False,
            )
            logits = task.teacher_classify(rec_embd, batch)
            rec = {"rec_embd": rec_embd}
        # preds follow the base model's logits_transform like the train
        # step (CMAMTask.predictions): multilabel → sigmoid+threshold,
        # probs per-class sigmoid (a softmax would force BCE-trained genre
        # scores to sum to 1)
        probs = (
            jax.nn.sigmoid(logits) if getattr(task, "multilabel", False)
            else jax.nn.softmax(logits, axis=-1)
        )
        return {
            "logits": logits,
            "preds": task.predictions(logits),
            "probs": probs,
            **rec,
        }

    return fn


def export_cmam(
    task,
    cmam_variables,
    example_batch: Dict[str, Any],
    path: str | Path,
    *,
    platforms: Sequence[str] = ("cpu", "tpu"),
    symbolic_batch: bool = True,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> Path:
    """Export a trained C-MAM + frozen base as ONE missing-modality serving
    artifact: available modalities in → imputed embedding + class scores
    out. Both networks' parameters are baked into the StableHLO blob."""
    from mmtpu.train.cmam_step import DualCMAMTask

    targets = [str(task.target_modality)]
    if isinstance(task, DualCMAMTask):
        targets.append(str(task.target_modality_two))
    meta = {
        "task_type": "cmam",
        "outputs": ["logits", "preds", "probs", "rec_embd"],
        "imputes": targets,
        "base_model": str(task.base_model_type),
        "model": type(task.cmam_model).__name__,
        "multilabel": bool(getattr(task, "multilabel", False)),
        "binary_threshold": float(getattr(task, "binary_threshold", 0.5)),
        **(extra_meta or {}),
    }
    return _export_fn(
        make_cmam_serving_fn(task, cmam_variables), task.input_modalities,
        example_batch, path, meta, platforms, symbolic_batch,
    )


@dataclasses.dataclass
class ServedModel:
    """A deserialized artifact: callable like `Predictor`, plus its meta."""

    meta: Dict[str, Any]
    exported: Any

    @property
    def input_keys(self) -> Sequence[str]:
        return tuple(self.meta["input_keys"])

    def __call__(self, *args, **kwargs) -> Dict[str, np.ndarray]:
        out = self.exported.call(*_resolve_inputs(self.input_keys, args, kwargs))
        return {k: np.asarray(v) for k, v in out.items()}


def load_artifact(path: str | Path) -> ServedModel:
    """Load a serving artifact written by `export_task`."""
    from jax import export as jexport

    raw = Path(path).read_bytes()
    if not raw.startswith(MAGIC):
        raise ValueError(f"{path}: not an mmtpu serving artifact")
    off = len(MAGIC)
    (meta_len,) = struct.unpack_from("<Q", raw, off)
    off += 8
    meta = json.loads(raw[off : off + meta_len].decode())
    blob = raw[off + meta_len :]
    return ServedModel(meta=meta, exported=jexport.deserialize(blob))
