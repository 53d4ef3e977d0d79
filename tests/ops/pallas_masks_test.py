"""Tests for the Pallas fused mask kernel (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu.ops import masks as mask_ops
from neuron_descriptions_tpu.ops import pallas_masks


def test_interpolation_matrix_equals_gather(rng):
    data = rng.normal(size=(5, 7, 9)).astype(np.float32)
    target = (20, 24)
    expected = np.asarray(
        mask_ops.upsample_bilinear(jnp.asarray(data), target))
    wy = pallas_masks.interpolation_matrix(target[0], 7)
    wx = pallas_masks.interpolation_matrix(target[1], 9)
    ours = np.einsum("th,nhw,uw->ntu", wy, data, wx)
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_fused_kernel_matches_unfused_path(rng):
    m, h, w, size = 6, 7, 7, 32
    acts = rng.normal(size=(m, h, w)).astype(np.float32)
    images = (rng.random((m, 3, size, size)) * 255).astype(np.float32)
    levels = rng.normal(size=(m,)).astype(np.float32) * 0.5

    masked, mask = pallas_masks.fused_masked_composite(
        jnp.asarray(acts), jnp.asarray(images), jnp.asarray(levels),
        (size, size))
    ref_masked, ref_mask = pallas_masks.reference_masked_composite(
        jnp.asarray(acts), jnp.asarray(images), jnp.asarray(levels),
        (size, size))

    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_array_equal(np.asarray(masked),
                                  np.asarray(ref_masked))


def test_fused_kernel_outside_bright(rng):
    acts = np.full((1, 4, 4), -10.0, np.float32)  # nothing passes threshold
    images = np.full((1, 3, 16, 16), 200.0, np.float32)
    levels = np.zeros((1,), np.float32)
    masked, mask = pallas_masks.fused_masked_composite(
        jnp.asarray(acts), jnp.asarray(images), jnp.asarray(levels),
        (16, 16), outside_bright=0.25)
    assert np.asarray(mask).sum() == 0
    np.testing.assert_array_equal(np.asarray(masked), 50)  # 200 * 0.25
