"""mmtpu — a TPU-native multimodal pretraining/finetuning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
"MML_Suite" research framework (task-specific encoder pretraining for
multimodal models with missing-modality robustness), designed TPU-first:

- models are pure Flax modules; training steps are jit/pjit-compiled pure
  functions over a `jax.sharding.Mesh` (data parallel over ICI),
- missing-modality pattern synthesis lives in a host-side pipeline that
  emits fixed-shape device batches (no per-step host<->device syncs),
- metrics accumulate on device and are finalized with sklearn on host at
  epoch boundaries only,
- checkpoints are Flax pytrees with a PyTorch `.pth` interop reader so
  reference-pretrained encoders load directly.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
