"""Structural protocol for trainable multimodal models
(reference: models/protocols.py:13-40).

In the TPU-native design the train/validation steps are external pure
functions, so the protocol covers the model-owned surface: the forward
call, per-modality encoder access, and embedding extraction."""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class MultimodalModelProtocol(Protocol):
    def __call__(self, *inputs: Any, train: bool = False) -> Any:  # noqa: D102
        ...

    def encode(self, *inputs: Any, train: bool = False) -> Any:
        """Per-modality embeddings (reference get_embeddings)."""
        ...


def get_encoder(model: Any, modality: str) -> Any:
    """Reference get_encoder dispatch: `{modality}_encoder` attribute or the
    UttFusion-style netA/netV/netT naming."""
    attr = f"{modality}_encoder"
    if hasattr(model, attr):
        return getattr(model, attr)
    net = {"audio": "netA", "video": "netV", "text": "netT"}.get(str(modality))
    if net and hasattr(model, net):
        return getattr(model, net)
    raise ValueError(f"Unknown modality: {modality}")
