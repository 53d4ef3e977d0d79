"""Pallas-fused mask upsample + threshold + composite (pass-2 hot kernel).

SURVEY.md §7 names this the fused kernel of the exemplar gather pass: for
each (unit, image) hit, upsample the unit's activation map to the output
resolution, threshold at the unit's quantile level, and composite the
binary mask with the image (reference chain:
src/deps/netdissect/upsample.py:30-43 grid_sample →
imgviz.py:185-198 threshold → imgviz.py:118-145 composite).

TPU design: the bilinear upsample is separable, so it is computed as two
small dense matmuls ``Wy @ act @ Wxᵀ`` with precomputed interpolation
matrices — MXU work instead of a gather — and the threshold + composite
fuse into the same VMEM-resident kernel invocation. One grid step handles
one (unit, image) pair; activations, both interpolation matrices, and the
image tile all fit comfortably in VMEM (≲1 MB at 224²).

Numerics match ``ops.masks.activation_mask`` + ``ops.masks.masked_image``
bit-for-bit (the interpolation matrices are built from the same
receptive-field affine map); ``fused_masked_composite`` falls back to
interpret mode off-TPU so the CPU test mesh exercises the same kernel.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuron_descriptions_tpu.ops import masks as mask_ops
from neuron_descriptions_tpu.utils.typing import Array

__all__ = ["interpolation_matrix", "fused_masked_composite"]


def interpolation_matrix(target_size: int, source_size: int,
                         scale: Optional[float] = None,
                         offset: Optional[float] = None) -> np.ndarray:
    """Dense (target, source) bilinear interpolation matrix.

    Rows hold the two taps of ``ops.masks.upsample_bilinear``'s separable
    gather (zero weight out of range), so ``W @ v`` equals the gather along
    one axis. Defaults to the NetDissect fill-target map
    (reference: upsample.py:134-138).
    """
    if scale is None or offset is None:
        scale = float(target_size) / float(source_size)
        offset = 0.5 * scale - 0.5
    coords = (np.arange(target_size, dtype=np.float64) - offset) / scale
    lo = np.floor(coords).astype(np.int64)
    frac = (coords - lo).astype(np.float32)
    hi = lo + 1

    matrix = np.zeros((target_size, source_size), np.float32)
    rows = np.arange(target_size)
    lo_valid = (lo >= 0) & (lo < source_size)
    hi_valid = (hi >= 0) & (hi < source_size)
    matrix[rows[lo_valid], lo[lo_valid]] += 1.0 - frac[lo_valid]
    matrix[rows[hi_valid], hi[hi_valid]] += frac[hi_valid]
    return matrix


def _kernel(acts_ref, images_ref, levels_ref, wy_ref, wx_ref,
            masked_ref, mask_ref, *, outside_bright: float):
    """One (unit, image) pair: upsample → threshold → composite."""
    act = acts_ref[0]          # (h, w)
    image = images_ref[0]      # (3, H, W) float byte-space
    level = levels_ref[pl.program_id(0)]  # scalar from SMEM

    # Separable bilinear upsample as two matmuls (MXU). HIGHEST precision
    # keeps the f32 taps exact (default precision rounds through bf16,
    # which moves threshold-adjacent pixels by ~1e-3).
    inner = jnp.dot(act, wx_ref[...].T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    up = jnp.dot(wy_ref[...], inner, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)  # (H, W)
    mask = up > level

    m = mask.astype(image.dtype)[None]  # (1, H, W), broadcast over channels
    composite = image * m + outside_bright * image * (1.0 - m)
    # Mosaic lacks a direct f32->u8 cast; round-trip through int32.
    masked_ref[0] = jnp.clip(composite, 0.0, 255.0).astype(
        jnp.int32).astype(jnp.uint8)
    mask_ref[0] = mask.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("target_shape", "outside_bright",
                                    "interpret"))
def fused_masked_composite(
        acts: Array,
        images: Array,
        levels: Array,
        target_shape: Tuple[int, int],
        outside_bright: float = 0.25,
        interpret: Optional[bool] = None) -> Tuple[Array, Array]:
    """Fused mask + composite over a batch of (unit, image) pairs.

    Args:
        acts: (M, h, w) activation maps (one unit each).
        images: (M, 3, H, W) images in float byte space [0, 255], already
            at the output resolution.
        levels: (M,) per-pair threshold.
        target_shape: (H, W) output resolution.

    Returns:
        (masked (M, 3, H, W) uint8, mask (M, H, W) uint8).
    """
    m, h, w = acts.shape
    th, tw = target_shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    wy = jnp.asarray(interpolation_matrix(th, h))
    wx = jnp.asarray(interpolation_matrix(tw, w))

    kernel = functools.partial(_kernel, outside_bright=outside_bright)
    masked, mask = pl.pallas_call(
        kernel,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, th, tw), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((th, h), lambda i: (0, 0)),
            pl.BlockSpec((tw, w), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 3, th, tw), jnp.uint8),
            jax.ShapeDtypeStruct((m, th, tw), jnp.uint8),
        ],
        interpret=interpret,
    )(jnp.asarray(acts, jnp.float32), jnp.asarray(images, jnp.float32),
      jnp.asarray(levels, jnp.float32), wy, wx)
    return masked, mask


def reference_masked_composite(acts: Array, images: Array, levels: Array,
                               target_shape: Tuple[int, int],
                               outside_bright: float = 0.25
                               ) -> Tuple[Array, Array]:
    """The unfused ops.masks path, for equivalence testing."""
    mask = mask_ops.activation_mask(acts, levels, target_shape)
    masked = mask_ops.masked_image(images, mask,
                                   outside_bright=outside_bright)
    return masked, mask.astype(jnp.uint8)
