"""Device mesh construction and sharding constructors."""
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "DATA_AXIS",
    "default_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "pad_to_multiple",
]

DATA_AXIS = "data"


def default_mesh(n_devices: Optional[int] = None,
                 axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over the first `n_devices` local devices.

    The exemplar scan and unit-sharded captioning both parallelize over one
    logical axis; higher-dimensional meshes (dp × tp) are built by callers
    that need them (see ``__graft_entry__.dryrun_multichip``).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS,
                  rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the mesh, replicate the rest."""
    spec = PartitionSpec(axis_name, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pad_to_multiple(batch: np.ndarray, multiple: int,
                    fill: float = 0.0) -> Tuple[np.ndarray, int]:
    """Pad the leading dim up to a multiple (for even mesh sharding).

    Returns (padded, original_length).
    """
    n = len(batch)
    target = -(-n // multiple) * multiple
    if target == n:
        return batch, n
    pad_shape = (target - n,) + batch.shape[1:]
    padded = np.concatenate(
        [batch, np.full(pad_shape, fill, dtype=batch.dtype)])
    return padded, n


def shard_batch(batch: np.ndarray, mesh: Mesh,
                axis_name: str = DATA_AXIS) -> Array:
    """Device-put a host batch sharded along the mesh's data axis."""
    sharding = data_sharding(mesh, axis_name, rank=batch.ndim)
    return jax.device_put(batch, sharding)
