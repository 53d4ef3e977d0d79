"""Mesh/sharding helpers for scaling over ICI.

The reference is strictly single-process single-device (SURVEY.md §2.11);
parallel execution is a first-class feature of this rebuild. The design
follows the standard JAX recipe: build a named ``Mesh``, annotate array
shardings with ``NamedSharding``/``PartitionSpec``, and let XLA insert the
collectives (psum/all-gather) that ride the ICI links.
"""
from neuron_descriptions_tpu.parallel.mesh import (DATA_AXIS,
                                                    data_sharding,
                                                    default_mesh,
                                                    pad_to_multiple,
                                                    replicated, shard_batch)

__all__ = [
    "DATA_AXIS",
    "default_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "pad_to_multiple",
]
