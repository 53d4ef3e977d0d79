"""Mergeable streaming quantile sketch.

TPU-native replacement for NetDissect's ``RunningQuantile`` KLL sketch
(reference: src/deps/netdissect/runningstats.py:274-628). The KLL sketch
keeps layered buffers with data-dependent fill pointers and random-offset
decimation — shapes and control flow that fight XLA's static-shape model
(SURVEY.md §7 "hard parts" #2). We instead use a *bottom-k tag reservoir*:

- every spatial location ever seen is assigned a random uint32 tag;
- the sketch keeps the ``r`` locations with the smallest tags, together with
  the activation value of **every unit** at those locations.

Keeping the bottom-r tags is exactly a uniform random sample of size r of all
locations, so per unit it is a uniform sample of that unit's activation
distribution — the same statistical object the reference's sketch degrades to
under subsampling (reference: runningstats.py:343-360 `_scan_extremes` /
subsampling fallback). Standard error of the q-quantile's rank is
``sqrt(q(1-q)/r)`` ≈ 0.0016 at r=4096, comfortably inside the reference's
0.1%-of-rank accuracy target for quantile=0.99 masks.

Why this shape is right for TPU:
- one ``sort``/``top_k`` over ``r + n`` tags per batch, shared by all units;
- value selection is a single gather of columns — a dense (units, r+n)
  operation that XLA lays out well;
- the state is a fixed-shape pytree: a valid ``lax.scan`` carry;
- merging two sketches = concatenating samples and re-taking the bottom-r
  tags, which is associative + commutative, so per-device sketches reduce
  across a mesh with a tree of merges (or ``all_gather`` + one merge).

Exact running min/max per unit are tracked separately so ``quantiles(0.)``
and ``quantiles(1.)`` are exact, mirroring the reference's extremes tracking.
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "QuantileState",
    "init",
    "update",
    "merge",
    "quantiles",
]

# Sentinel tag for unfilled reservoir slots: larger than any random tag, so
# real samples always displace empty slots in a bottom-k selection. Random
# tags are masked to 31 bits so that int32 comparisons never see the
# sentinel range.
_EMPTY_TAG = jnp.int32(2**31 - 1)
_TAG_MASK = jnp.uint32(2**31 - 2)


class QuantileState(NamedTuple):
    """Bottom-k reservoir sketch over per-unit activation distributions.

    Fields:
        samples: (units, r) activation values at the retained locations.
            Invalid slots (when fewer than r locations seen) hold +inf.
        tags: (r,) int32 random tags of the retained locations, shared by
            all units (each location contributes one value per unit).
        count: () int32 total number of locations seen.
        minima: (units,) exact running minimum.
        maxima: (units,) exact running maximum.
    """

    samples: Array
    tags: Array
    count: Array
    minima: Array
    maxima: Array


def init(units: int, r: int = 4096,
         dtype: jnp.dtype = jnp.float32) -> QuantileState:
    """Create an empty sketch for `units` units with resolution `r`.

    The reference defaults to r=4096 in the tally driver (reference:
    src/deps/netdissect/tally.py:200); we match that default.
    """
    return QuantileState(
        samples=jnp.full((units, r), jnp.inf, dtype=dtype),
        tags=jnp.full((r,), _EMPTY_TAG, dtype=jnp.int32),
        count=jnp.zeros((), jnp.int32),
        minima=jnp.full((units,), jnp.inf, dtype=dtype),
        maxima=jnp.full((units,), -jnp.inf, dtype=dtype),
    )


def _bottom_k(samples: Array, tags: Array, r: int):
    """Keep the r entries with the smallest tags."""
    # top_k of negated tags == bottom-k; tags fit in 31 bits so negation is
    # safe in int32.
    _, keep = jax.lax.top_k(-tags, r)
    return samples[:, keep], tags[keep]


def update(state: QuantileState, x: Array, key: Array,
           valid: Optional[Array] = None) -> QuantileState:
    """Fold a batch of activations into the sketch.

    Args:
        state: Current sketch.
        x: (n, units) activation of every unit at each of n spatial
            locations (the reference flattens NHWC to (-1, channels) before
            feeding its sketch, reference: src/exemplars/compute.py:332).
        key: PRNG key for this batch (fold in the batch index upstream so
            scans stay deterministic).
        valid: Optional () int32 count of valid rows; rows >= ``valid`` are
            padding (from rounding batches up to a mesh-shard multiple) and
            are excluded from the sketch and extremes.

    Returns:
        Updated sketch with identical shapes (valid scan carry).
    """
    n, units = x.shape
    r = state.tags.shape[0]

    new_tags = (jax.random.bits(key, (n,), jnp.uint32)
                & _TAG_MASK).astype(jnp.int32)
    if valid is None:
        x_min = x.min(axis=0)
        x_max = x.max(axis=0)
        seen = jnp.int32(n)
    else:
        row_ok = jnp.arange(n, dtype=jnp.int32) < valid
        # Padded rows get the sentinel tag so real samples always displace
        # them, and +inf values so that — while the sketch is underfull and
        # they do occupy slots — they respect the invalid-slot invariant
        # that ``quantiles`` relies on (+inf sorts last).
        new_tags = jnp.where(row_ok, new_tags, _EMPTY_TAG)
        x_max = jnp.where(row_ok[:, None], x, -jnp.inf).max(axis=0)
        x = jnp.where(row_ok[:, None], x, jnp.inf)
        x_min = x.min(axis=0)
        seen = jnp.int32(valid)
    all_tags = jnp.concatenate([state.tags, new_tags])
    all_samples = jnp.concatenate([state.samples, x.T], axis=1)
    samples, tags = _bottom_k(all_samples, all_tags, r)

    return QuantileState(
        samples=samples,
        tags=tags,
        count=state.count + seen,
        minima=jnp.minimum(state.minima, x_min),
        maxima=jnp.maximum(state.maxima, x_max),
    )


def merge(a: QuantileState, b: QuantileState) -> QuantileState:
    """Merge two sketches built over disjoint location sets."""
    r = a.tags.shape[0]
    samples, tags = _bottom_k(
        jnp.concatenate([a.samples, b.samples], axis=1),
        jnp.concatenate([a.tags, b.tags]), r)
    return QuantileState(
        samples=samples,
        tags=tags,
        count=a.count + b.count,
        minima=jnp.minimum(a.minima, b.minima),
        maxima=jnp.maximum(a.maxima, b.maxima),
    )


def quantiles(state: QuantileState, q) -> Array:
    """Estimate per-unit quantiles.

    Args:
        state: The sketch.
        q: scalar or (m,) quantile levels in [0, 1].

    Returns:
        (units,) array for scalar q, else (units, m) — matching the
        orientation of ``RunningQuantile.quantiles`` (reference:
        runningstats.py:557-580).
    """
    q_arr = jnp.atleast_1d(jnp.asarray(q, dtype=state.samples.dtype))

    r = state.samples.shape[1]
    m = jnp.minimum(state.count, r)  # number of valid slots

    # Invalid slots hold +inf, so an ascending sort puts them last and
    # order statistics over the first m entries are correct.
    sorted_samples = jnp.sort(state.samples, axis=1)

    # Linear interpolation between order statistics at position q*(m-1).
    pos = q_arr * (m - 1).astype(q_arr.dtype)
    pos = jnp.clip(pos, 0.0, jnp.maximum(m - 1, 0).astype(q_arr.dtype))
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(m - 1, 0))
    frac = pos - lo.astype(q_arr.dtype)

    vlo = sorted_samples[:, lo]
    vhi = sorted_samples[:, hi]
    est = vlo * (1.0 - frac) + vhi * frac

    # Splice in the exact extremes at q==0 and q==1.
    est = jnp.where(q_arr[None, :] <= 0.0, state.minima[:, None], est)
    est = jnp.where(q_arr[None, :] >= 1.0, state.maxima[:, None], est)

    if jnp.ndim(q) == 0:
        return est[:, 0]
    return est
