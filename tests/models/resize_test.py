"""Parity tests for the torch-semantics resize helpers.

Mask and pos-embed geometry must match torch's ``F.interpolate`` exactly or
masks (and thus captions) drift — SURVEY.md §7 hard part #4.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu.milan.encoders import resize_bilinear
from neuron_descriptions_tpu.models.vit import _resize_bicubic

torch = pytest.importorskip("torch")
from torch.nn import functional as F  # noqa: E402


@pytest.mark.parametrize("in_size,out_size", [
    ((16, 16), (7, 7)),     # downsample (no antialias!)
    ((8, 8), (14, 14)),     # upsample
    ((9, 13), (5, 7)),      # non-square, non-integral scale
])
def test_bilinear_matches_torch(rng, in_size, out_size):
    x = rng.normal(size=(2, 3, *in_size)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), *out_size))
    theirs = F.interpolate(torch.from_numpy(x), size=out_size,
                           mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [
    ((28, 28), (14, 14)),
    ((7, 7), (12, 12)),
    ((10, 6), (5, 9)),
])
def test_bicubic_matches_torch(rng, in_size, out_size):
    x = rng.normal(size=(1, 4, *in_size)).astype(np.float32)
    ours = np.asarray(_resize_bicubic(jnp.asarray(x), *out_size))
    theirs = F.interpolate(torch.from_numpy(x), size=out_size,
                           mode="bicubic", align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
