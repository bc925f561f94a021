"""Device mesh + sharding helpers — the framework's parallelism substrate.

The reference is strictly single-process/single-device (SURVEY.md §2.2); the
TPU-native design scales by data parallelism over the ICI mesh: batches are
sharded over the 'data' axis, parameters replicated (optionally sharded over
a 'model' axis for wide fusion layers), and gradient all-reduce happens
implicitly inside the jit-compiled train step via XLA collectives.

No NCCL/MPI analogue exists or is needed: XLA's SPMD partitioner inserts the
ICI collectives from the shardings alone.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass
class MeshConfig:
    """Shape of the device mesh. data_parallel=-1 → all devices."""

    data_parallel: int = -1
    model_parallel: int = 1


_default_mesh: Optional[Mesh] = None


def create_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    config = config or MeshConfig()
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, config.model_parallel)
    dp = config.data_parallel if config.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    if not explicit:
        # mesh_utils lays the mesh out along the ICI topology so the
        # per-step gradient all-reduce rides neighbor links; a naive
        # jax.devices() reshape can pair non-adjacent chips on the data
        # axis on larger slices
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((dp, mp), devices=devices)
            return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))
        except Exception:  # virtual/CPU device sets: fall through
            pass
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def set_default_mesh(mesh: Mesh) -> None:
    global _default_mesh
    _default_mesh = mesh


def get_default_mesh() -> Mesh:
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = create_mesh()
    return _default_mesh


def put_global(x: Any, sharding: NamedSharding) -> jax.Array:
    """device_put that also works on a multi-process mesh.

    Single-process: plain jax.device_put. Multi-process (after
    jax.distributed.initialize): a mesh spans devices this process cannot
    address, so build the global array from a callback — each process
    materializes only its addressable shards. The caller must hold the
    FULL global value (the loaders are deterministic per epoch, so every
    process computes the same global batch and keeps its slice; no
    cross-host data exchange happens here).
    """
    if jax.process_count() == 1:
        # device_put reshards device-to-device; materializing through
        # np.asarray here would drag every leaf host-side (over the axon
        # tunnel, for params + optimizer moments) for no reason
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def batch_sharding(mesh: Optional[Mesh] = None, ndim: int = 2) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    mesh = mesh or get_default_mesh()
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_default_mesh()
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Optional[Mesh] = None) -> Dict[str, Any]:
    """Place a host batch on device, sharded over the data axis.

    Every array leaf's leading dim must be divisible by the data-axis size
    — validated here with an actionable error (the loader pads to
    batch_size, which the config/CLI layer must choose as a multiple of
    data_parallel). Scalars replicate.
    """
    mesh = mesh or get_default_mesh()
    dp = mesh.shape[DATA_AXIS]

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return put_global(x, replicate(mesh))
        if x.shape[0] % dp:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by data_parallel={dp}"
                " — pick a batch_size that is a multiple of the data-axis"
                " size (or lower --data-parallel)"
            )
        return put_global(x, batch_sharding(mesh, ndim=x.ndim))

    return jax.tree_util.tree_map(_put, batch)
