"""Data-parallel exemplar statistics over a device mesh.

The reference is strictly single-device (SURVEY.md §2.11); this module is
the TPU-native scale-out it never had. The pass-1 exemplar scan (reference:
src/deps/netdissect/tally.py:199-222) becomes:

- every device holds its own ``TopKState`` + ``QuantileState`` partial;
- each host batch is padded to a multiple of the mesh size and sharded
  along the batch axis (images *and* their flattened spatial locations
  shard identically because both are laid out batch-major);
- one ``shard_map``-wrapped fold updates each device's partial from its
  local rows — zero collectives in the hot loop, the subject-model forward
  runs fully data-parallel on the MXU;
- after the stream ends, the per-device partials are tree-reduced with the
  associative ``merge`` ops (``ops.topk.merge`` / ``ops.quantile.merge``).

Because the merges are exact for top-k and exchangeable for the quantile
reservoir, sharded results match a single-device scan up to the sketch's
sampling randomness (top-k: bit-exact up to ties).
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from neuron_descriptions_tpu.ops import quantile as quantile_ops
from neuron_descriptions_tpu.ops import topk as topk_ops
from neuron_descriptions_tpu.parallel.mesh import DATA_AXIS
from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "ShardedStats",
    "init_sharded",
    "make_sharded_fold",
    "merge_sharded",
]

ShardedStats = Tuple[topk_ops.TopKState, quantile_ops.QuantileState]


def _stack(state, n: int):
    return jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf[None], (n,) + leaf.shape), state)


def init_sharded(mesh: Mesh, units: int, k: int,
                 r: int = 4096) -> ShardedStats:
    """Per-device (stacked, device-axis-sharded) empty accumulator states."""
    n = mesh.devices.size
    tk = _stack(topk_ops.init(units, k), n)
    qs = _stack(quantile_ops.init(units, r=r), n)
    sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    place = lambda leaf: jax.device_put(leaf, sharding)  # noqa: E731
    return (jax.tree_util.tree_map(place, tk),
            jax.tree_util.tree_map(place, qs))


def make_sharded_fold(mesh: Mesh, axis_name: str = DATA_AXIS):
    """Build the jitted sharded pass-1 fold for ``mesh``.

    Returns ``fold(tk, qs, pooled, flat, start, valid, key) -> (tk, qs)``
    where ``tk``/``qs`` are stacked per-device states (leading dim =
    mesh size, sharded over the mesh), ``pooled`` is (batch, units) and
    ``flat`` is (batch * locs, units), both padded so the batch axis
    divides the mesh size; ``start`` is the global dataset index of row 0
    and ``valid`` the number of non-padding rows in ``pooled``.
    """
    n_dev = mesh.devices.size
    state_spec = PartitionSpec(axis_name)
    data_spec = PartitionSpec(axis_name)
    none_spec = PartitionSpec()

    def local_fold(tk, qs, pooled, flat, start, valid, key):
        # Leading device axis is size 1 locally; squeeze it off the states.
        tk = jax.tree_util.tree_map(lambda leaf: leaf[0], tk)
        qs = jax.tree_util.tree_map(lambda leaf: leaf[0], qs)

        d = jax.lax.axis_index(axis_name)
        per = pooled.shape[0]  # local rows per device
        locs = flat.shape[0] // per  # spatial locations per sample

        local_start = start + d * per
        local_valid = jnp.clip(valid - d * per, 0, per)

        tk = topk_ops.update(tk, pooled, local_start, valid=local_valid)
        qs = quantile_ops.update(qs, flat, jax.random.fold_in(key, d),
                                 valid=local_valid * locs)

        expand = lambda leaf: leaf[None]  # noqa: E731
        return (jax.tree_util.tree_map(expand, tk),
                jax.tree_util.tree_map(expand, qs))

    shard_fold = jax.shard_map(
        local_fold,
        mesh=mesh,
        in_specs=(state_spec, state_spec, data_spec, data_spec, none_spec,
                  none_spec, none_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(shard_fold, donate_argnums=(0, 1))


def merge_sharded(stats: ShardedStats) -> Tuple[topk_ops.TopKState,
                                                quantile_ops.QuantileState]:
    """Tree-reduce stacked per-device partials into one global state."""
    tk_stack, qs_stack = stats
    n = int(jax.tree_util.tree_leaves(tk_stack)[0].shape[0])

    take = lambda stack, i: jax.tree_util.tree_map(  # noqa: E731
        lambda leaf: leaf[i], stack)

    tk = take(tk_stack, 0)
    qs = take(qs_stack, 0)
    for i in range(1, n):
        tk = topk_ops.merge(tk, take(tk_stack, i))
        qs = quantile_ops.merge(qs, take(qs_stack, i))
    return tk, qs


def pad_rows(array, multiple: int):
    """Pad the leading axis to a multiple, returning (padded, n_valid)."""
    import numpy as np

    n = array.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return array, n
    pad = np.zeros((target - n,) + tuple(array.shape[1:]),
                   dtype=np.asarray(array).dtype)
    return np.concatenate([np.asarray(array), pad]), n
