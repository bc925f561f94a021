"""Serving & deployment: self-contained inference artifacts + batching.

Beyond-reference subsystem (the reference MML_Suite is a training harness
with no inference/serving path): trained mmtpu models export to a single
portable artifact — StableHLO via `jax.export`, parameters baked in,
lowered for BOTH tpu and cpu, with a symbolic batch dimension so one
artifact serves any batch size — and a thread-safe micro-batcher turns
single-sample requests into padded fixed-shape batches (one compile per
bucket) for online serving.

    from mmtpu.serving import Predictor, export_task, load_artifact

    export_task(task, state.variables, example_batch, "model.mmx")
    served = load_artifact("model.mmx")          # any host, cpu or tpu
    out = served(audio=a, image=i)               # dict: logits/preds/probs

Offline batch inference over a dataset split: `python -m mmtpu.cli.predict`.
"""

from mmtpu.serving.batcher import MicroBatcher
from mmtpu.serving.export import (
    Predictor,
    ServedModel,
    export_cmam,
    export_task,
    load_artifact,
    make_cmam_serving_fn,
    make_serving_fn,
)

__all__ = [
    "MicroBatcher",
    "Predictor",
    "ServedModel",
    "export_cmam",
    "export_task",
    "load_artifact",
    "make_cmam_serving_fn",
    "make_serving_fn",
]
