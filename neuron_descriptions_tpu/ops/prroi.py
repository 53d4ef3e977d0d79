"""Precise RoI Pooling (PrRoIPool) as an exact, MXU-native XLA program.

The reference vendors a CUDA implementation
(reference: src/deps/netdissect/upsegmodel/prroi_pool/src/
prroi_pooling_gpu_impl.cu) used by the classic-NetDissect segmentation
models. PrRoIPool (Jiang et al., 2018) averages the *continuous* bilinear
interpolant F(x, y) of the feature map over each RoI bin:

    out[bin] = (1 / area) ∬_bin F(x, y) dx dy

TPU design: F is separable over hat basis functions,
``F(x, y) = Σ_ij f[i, j] φ_i(y) φ_j(x)``, so the double integral factors
into per-axis hat-integral weights:

    ∬ F = Σ_ij f[i, j] · (∫ φ_i over [y0, y1]) · (∫ φ_j over [x0, x1])
        = wyᵀ · f · wx

Per RoI this is two small dense matmuls ``Wy @ f @ Wxᵀ`` with
analytically-exact weight matrices — the same MXU pattern as the Pallas
mask kernel, instead of the CUDA kernel's per-pixel ``mat_calculation``
loop. Coordinates outside the feature map integrate to zero (matching the
CUDA kernel, which only accumulates in-bounds taps).
"""
from typing import Tuple, Union

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array

__all__ = ["hat_integral_weights", "prroi_pool2d"]

IntPair = Union[int, Tuple[int, int]]


def _hat_antiderivative(t: Array, size: int) -> Array:
    """Φ_i(t) = ∫_{-∞}^{t} φ_i for every hat center i in [0, size).

    φ_i(u) = max(0, 1 - |u - i|). Returns shape t.shape + (size,).
    """
    centers = jnp.arange(size, dtype=t.dtype)
    u = t[..., None] - centers  # position relative to each center
    u = jnp.clip(u, -1.0, 1.0)
    # Piecewise antiderivative with Φ_i(center - 1) = 0:
    #   u in [-1, 0]: (u + 1)^2 / 2 ;  u in [0, 1]: 1 - (1 - u)^2 / 2.
    left = 0.5 * (u + 1.0) ** 2
    right = 1.0 - 0.5 * (1.0 - u) ** 2
    return jnp.where(u < 0.0, left, right)


def hat_integral_weights(starts: Array, ends: Array, size: int) -> Array:
    """Exact ∫ φ_i over [start, end] for each hat i, per (start, end) row.

    Args:
        starts, ends: (...,) continuous interval bounds in feature coords.
        size: Number of hat centers (the feature axis length).

    Returns:
        (..., size) weights; zero where the interval misses a hat support.
    """
    return (_hat_antiderivative(ends, size) -
            _hat_antiderivative(starts, size))


def prroi_pool2d(features: Array,
                 rois: Array,
                 pooled_size: IntPair,
                 spatial_scale: float = 1.0) -> Array:
    """Precise RoI pooling.

    Args:
        features: (N, C, H, W) feature maps.
        rois: (R, 5) rows of (batch_index, x0, y0, x1, y1) in input-image
            coordinates (scaled by ``spatial_scale`` into feature coords,
            the CUDA kernel's convention).
        pooled_size: Output (ph, pw).
        spatial_scale: Feature-coord scale factor.

    Returns:
        (R, C, ph, pw) averaged bin values (0 for empty bins).
    """
    ph, pw = ((pooled_size, pooled_size)
              if isinstance(pooled_size, int) else pooled_size)
    n, c, h, w = features.shape
    rois = jnp.asarray(rois, features.dtype)

    batch_idx = rois[:, 0].astype(jnp.int32)
    x0 = rois[:, 1] * spatial_scale
    y0 = rois[:, 2] * spatial_scale
    x1 = rois[:, 3] * spatial_scale
    y1 = rois[:, 4] * spatial_scale

    bin_w = (x1 - x0) / pw  # (R,)
    bin_h = (y1 - y0) / ph

    # Per-RoI, per-bin interval bounds along each axis.
    px = jnp.arange(pw, dtype=features.dtype)
    py = jnp.arange(ph, dtype=features.dtype)
    xs0 = x0[:, None] + px[None, :] * bin_w[:, None]  # (R, pw)
    xs1 = xs0 + bin_w[:, None]
    ys0 = y0[:, None] + py[None, :] * bin_h[:, None]  # (R, ph)
    ys1 = ys0 + bin_h[:, None]

    wx = hat_integral_weights(xs0, xs1, w)  # (R, pw, W)
    wy = hat_integral_weights(ys0, ys1, h)  # (R, ph, H)

    roi_features = features[batch_idx]  # (R, C, H, W)
    integrals = jnp.einsum("rph,rchw,rqw->rcpq", wy, roi_features, wx)

    area = (bin_w * bin_h)[:, None, None, None]
    return jnp.where(area > 0, integrals / jnp.maximum(area, 1e-12), 0.0)
