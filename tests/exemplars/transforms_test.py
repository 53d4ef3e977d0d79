"""Tests for exemplar input/hidden adapters."""
import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu.exemplars import transforms


def test_first():
    assert transforms.first(1, 2, 3) == (1,)


def test_identity():
    assert transforms.identity("x") == "x"


def test_identities():
    assert transforms.identities(1, 2) == (1, 2)


def test_spatialize_vit_mlp(rng):
    batch, patches, units = 2, 16, 5
    hiddens = rng.normal(size=(batch, patches + 1, units)).astype(np.float32)
    out = np.asarray(transforms.spatialize_vit_mlp(jnp.asarray(hiddens)))
    assert out.shape == (batch, units, 4, 4)
    # CLS token dropped; remaining patches land row-major.
    np.testing.assert_allclose(out[0, :, 0, 0], hiddens[0, 1], atol=1e-6)
    np.testing.assert_allclose(out[1, :, 3, 3], hiddens[1, -1], atol=1e-6)


def test_spatialize_vit_mlp_non_square(rng):
    hiddens = rng.normal(size=(1, 8, 3)).astype(np.float32)  # 7 patches
    with pytest.raises(ValueError):
        transforms.spatialize_vit_mlp(jnp.asarray(hiddens))
