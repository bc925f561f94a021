"""Dataset registry (reference: config/resolvers.py:192-221 + data/__init__.py)."""

from __future__ import annotations

from typing import Type

from mmtpu.data.avmnist import AVMNIST, SyntheticAVMNIST
from mmtpu.data.base import MultimodalArrayDataset
from mmtpu.data.loader import BatchLoader, DevicePrefetcher, build_loader


def resolve_dataset_name(name: str) -> Type[MultimodalArrayDataset]:
    key = name.lower()
    if key == "avmnist":
        return AVMNIST
    if key in ("synthetic_avmnist", "avmnist_synthetic"):
        return SyntheticAVMNIST
    if key == "synthetic_mosi":
        from mmtpu.data.mosi import SyntheticMOSI

        return SyntheticMOSI
    if key == "synthetic_mmimdb":
        from mmtpu.data.mmimdb import SyntheticMMIMDb

        return SyntheticMMIMDb
    if key in ("mosi", "mosei"):
        from mmtpu.data.mosi import MOSEI, MOSI

        return MOSI if key == "mosi" else MOSEI
    if key == "mm_imdb":
        from mmtpu.data.mmimdb import MMIMDb

        return MMIMDb
    if key == "iemocap":
        from mmtpu.data.iemocap import IEMOCAP

        return IEMOCAP
    if key == "kinetics_sounds":
        from mmtpu.data.kinetics_sounds import KineticsSounds

        return KineticsSounds
    if key == "msp_improv":
        raise NotImplementedError(
            "msp_improv is an empty stub in the reference (data/msp_improv.py)"
        )
    raise ValueError(f"Unknown dataset: {name}")


__all__ = [
    "AVMNIST",
    "SyntheticAVMNIST",
    "MultimodalArrayDataset",
    "BatchLoader",
    "DevicePrefetcher",
    "build_loader",
    "resolve_dataset_name",
]
