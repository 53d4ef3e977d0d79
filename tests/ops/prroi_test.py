"""Tests for Precise RoI Pooling.

The analytic hat-integral formulation is validated against dense numeric
integration of the bilinear interpolant (the op's defining property,
reference CUDA: prroi_pooling_gpu_impl.cu) and against hand-computed
closed forms.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu.ops import prroi


def bilinear(feature: np.ndarray, y: float, x: float) -> float:
    """Zero-padded bilinear interpolant (hat-basis expansion)."""
    h, w = feature.shape
    total = 0.0
    for i in range(max(0, int(np.floor(y)) - 1),
                   min(h, int(np.floor(y)) + 2)):
        for j in range(max(0, int(np.floor(x)) - 1),
                       min(w, int(np.floor(x)) + 2)):
            wy = max(0.0, 1.0 - abs(y - i))
            wx = max(0.0, 1.0 - abs(x - j))
            total += feature[i, j] * wy * wx
    return total


def numeric_bin_average(feature, y0, y1, x0, x1, steps=80):
    ys = np.linspace(y0, y1, steps, endpoint=False) + (y1 - y0) / (2 * steps)
    xs = np.linspace(x0, x1, steps, endpoint=False) + (x1 - x0) / (2 * steps)
    values = [bilinear(feature, y, x) for y in ys for x in xs]
    return float(np.mean(values))


def test_hat_integral_weights_full_support():
    # Integral of one full hat is exactly 1; an interval covering all
    # supports therefore sums features with weight 1 each (interior hats).
    weights = np.asarray(prroi.hat_integral_weights(
        jnp.asarray([0.0]), jnp.asarray([4.0]), 5))[0]
    np.testing.assert_allclose(weights, [0.5, 1.0, 1.0, 1.0, 0.5],
                               atol=1e-6)


def test_matches_numeric_integration(rng):
    feature = rng.normal(size=(1, 2, 7, 9)).astype(np.float32)
    rois = np.asarray([[0, 1.3, 0.7, 7.9, 5.2],
                       [0, 0.0, 0.0, 4.0, 4.0]], np.float32)
    pooled = np.asarray(prroi.prroi_pool2d(jnp.asarray(feature),
                                           jnp.asarray(rois), (2, 3)))
    assert pooled.shape == (2, 2, 2, 3)

    for r, (_, x0, y0, x1, y1) in enumerate(rois):
        bin_h, bin_w = (y1 - y0) / 2, (x1 - x0) / 3
        for ch in range(2):
            for by in range(2):
                for bx in range(3):
                    expected = numeric_bin_average(
                        feature[0, ch],
                        y0 + by * bin_h, y0 + (by + 1) * bin_h,
                        x0 + bx * bin_w, x0 + (bx + 1) * bin_w)
                    assert pooled[r, ch, by, bx] == pytest.approx(
                        expected, abs=2e-3), (r, ch, by, bx)


def test_constant_feature_interior():
    # Over a region fully interior to the hat grid, the average of a
    # constant field is that constant.
    feature = np.ones((1, 1, 8, 8), np.float32) * 3.5
    rois = np.asarray([[0, 1.0, 1.0, 6.0, 6.0]], np.float32)
    pooled = np.asarray(prroi.prroi_pool2d(jnp.asarray(feature),
                                           jnp.asarray(rois), 2))
    np.testing.assert_allclose(pooled, 3.5, atol=1e-5)


def test_spatial_scale():
    feature = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    rois_img = np.asarray([[0, 0.0, 0.0, 6.0, 6.0]], np.float32)
    a = np.asarray(prroi.prroi_pool2d(jnp.asarray(feature),
                                      jnp.asarray(rois_img), 2,
                                      spatial_scale=0.5))
    rois_feat = np.asarray([[0, 0.0, 0.0, 3.0, 3.0]], np.float32)
    b = np.asarray(prroi.prroi_pool2d(jnp.asarray(feature),
                                      jnp.asarray(rois_feat), 2))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_batch_index_selects_map(rng):
    features = rng.normal(size=(2, 1, 6, 6)).astype(np.float32)
    roi = [0.5, 0.5, 4.5, 4.5]
    rois = np.asarray([[0, *roi], [1, *roi]], np.float32)
    pooled = np.asarray(prroi.prroi_pool2d(jnp.asarray(features),
                                           jnp.asarray(rois), 2))
    assert not np.allclose(pooled[0], pooled[1])


def test_empty_bin_is_zero():
    feature = np.ones((1, 1, 4, 4), np.float32)
    rois = np.asarray([[0, 2.0, 2.0, 2.0, 2.0]], np.float32)  # zero area
    pooled = np.asarray(prroi.prroi_pool2d(jnp.asarray(feature),
                                           jnp.asarray(rois), 2))
    np.testing.assert_allclose(pooled, 0.0)
