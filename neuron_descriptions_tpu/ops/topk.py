"""Streaming per-unit top-k accumulator.

TPU-native replacement for NetDissect's ``RunningTopK`` (reference:
src/deps/netdissect/runningstats.py:31-151). The reference keeps a 5k-wide
ring buffer per channel and compresses on overflow by re-running ``topk``;
that design exists because the accumulator lives on a CUDA stream with
dynamic occupancy. On TPU we want fixed shapes and a single fused op per
batch, so the state is simply the current ``(values, indices)`` top-k per
unit; each update concatenates the incoming pooled activations and re-selects
with ``lax.top_k`` — one O((k + batch) log k)-ish selection entirely on the
VPU/MXU, no host control flow, jit/vmap/shard_map safe.

The state is a pytree and ``merge`` is associative + commutative up to ties,
so per-device partial states can be tree-reduced across a mesh (e.g. after a
sharded scan over the dataset's batch axis).
"""
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "TopKState",
    "init",
    "update",
    "merge",
    "result",
]


class TopKState(NamedTuple):
    """Running top-k state for a group of units.

    Fields:
        values: (units, k) activation values, sorted descending along axis 1
            (ascending if tracking smallest). Unfilled slots hold -inf (+inf).
        indices: (units, k) int32 dataset indices of the samples achieving
            each value; -1 for unfilled slots.
        count: () int32 number of samples seen so far.

    Whether the state tracks maxima or minima is not stored here — pass the
    same ``largest=`` to ``init``/``update``/``merge`` (keeping it out of the
    pytree keeps the state a pure array container for scan/shard_map).
    """

    values: Array
    indices: Array
    count: Array


def init(units: int, k: int, largest: bool = True,
         dtype: jnp.dtype = jnp.float32) -> TopKState:
    """Create an empty top-k state for `units` units."""
    fill = -jnp.inf if largest else jnp.inf
    values = jnp.full((units, k), fill, dtype=dtype)
    indices = jnp.full((units, k), -1, dtype=jnp.int32)
    return TopKState(values=values, indices=indices,
                     count=jnp.zeros((), jnp.int32))


def update(state: TopKState, pooled: Array, start_index: Array,
           largest: bool = True,
           valid: Optional[Array] = None) -> TopKState:
    """Fold one batch of pooled activations into the state.

    Args:
        state: Current accumulator state.
        pooled: (batch, units) per-sample pooled activation for every unit
            (the reference max-pools spatial dims before this point,
            reference: src/exemplars/compute.py:333).
        start_index: () int32 dataset index of the first sample in the batch;
            sample ``i`` of the batch has dataset index ``start_index + i``.
        largest: Track maxima (True) or minima (False). Must match `init`.
        valid: Optional () int32 count of valid rows; rows >= ``valid`` are
            padding (from rounding batches up to a mesh-shard multiple) and
            are excluded from the selection.

    Returns:
        The updated state. Shapes are identical to the input state, so this
        is a valid ``lax.scan`` carry.
    """
    batch, units = pooled.shape
    k = state.values.shape[1]

    batch_idx = start_index + jnp.arange(batch, dtype=jnp.int32)
    if valid is not None:
        row_ok = jnp.arange(batch, dtype=jnp.int32) < valid
        fill = -jnp.inf if largest else jnp.inf
        pooled = jnp.where(row_ok[:, None], pooled, fill)
        batch_idx = jnp.where(row_ok, batch_idx, -1)
    cand_values = jnp.concatenate([state.values, pooled.T], axis=1)
    cand_indices = jnp.concatenate(
        [state.indices,
         jnp.broadcast_to(batch_idx[None, :], (units, batch))], axis=1)

    sign = 1.0 if largest else -1.0
    top_values, top_pos = jax.lax.top_k(sign * cand_values, k)
    new_values = sign * top_values
    new_indices = jnp.take_along_axis(cand_indices, top_pos, axis=1)
    seen = jnp.int32(batch) if valid is None else jnp.int32(valid)
    return TopKState(values=new_values.astype(state.values.dtype),
                     indices=new_indices,
                     count=state.count + seen)


def merge(a: TopKState, b: TopKState, largest: bool = True) -> TopKState:
    """Merge two partial top-k states (e.g. from different mesh shards).

    Both states must track the same units with the same k but may have seen
    disjoint (globally-indexed) slices of the dataset.
    """
    k = a.values.shape[1]
    cand_values = jnp.concatenate([a.values, b.values], axis=1)
    cand_indices = jnp.concatenate([a.indices, b.indices], axis=1)
    sign = 1.0 if largest else -1.0
    top_values, top_pos = jax.lax.top_k(sign * cand_values, k)
    return TopKState(values=(sign * top_values).astype(a.values.dtype),
                     indices=jnp.take_along_axis(cand_indices, top_pos,
                                                 axis=1),
                     count=a.count + b.count)


def result(state: TopKState) -> Tuple[Array, Array]:
    """Return (values, indices), both (units, k), sorted by rank.

    Mirrors ``RunningTopK.result()`` (reference: runningstats.py:129-139),
    which returns values sorted descending with their dataset indices.
    """
    return state.values, state.indices
