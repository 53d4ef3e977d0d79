"""Tests for mask geometry vs torch grid_sample/interpolate oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neuron_descriptions_tpu.ops import masks


def torch_grid_upsample(data: np.ndarray, target_shape, scale, offset):
    """The reference's grid_sample path (upsample.py:124-155) as an oracle."""
    ts = target_shape
    ss = data.shape[-2:]
    ty = ((torch.arange(ts[0], dtype=torch.float) - offset[0])
          * (2 / (scale[0] * max(1, ss[0] - 1))) - 1)
    tx = ((torch.arange(ts[1], dtype=torch.float) - offset[1])
          * (2 / (scale[1] * max(1, ss[1] - 1))) - 1)
    grid = torch.stack(
        (tx[None, :].expand(ts), ty[:, None].expand(ts)), 2)[None]
    x = torch.from_numpy(data)[None, None]
    out = torch.nn.functional.grid_sample(x, grid, mode="bilinear",
                                          padding_mode="zeros",
                                          align_corners=True)
    return out[0, 0].numpy()


@pytest.mark.parametrize("scale,offset", [
    ((32.0, 32.0), (0.0, 0.0)),     # resnet-style centered
    ((32.0, 32.0), (31.0, 31.0)),   # alexnet-style shifted
    ((16.0, 16.0), (7.5, 7.5)),
])
def test_upsample_matches_grid_sample(scale, offset):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((7, 7)).astype(np.float32)
    target = (224, 224)

    want = torch_grid_upsample(data, target, scale, offset)
    got = np.asarray(masks.upsample_bilinear(
        jnp.asarray(data), target,
        scale_offset=((scale[0], offset[0]), (scale[1], offset[1]))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upsample_default_matches_grid_sample():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((14, 14)).astype(np.float32)
    target = (64, 64)
    # Default scale/offset per upsample.py:134-138.
    scale = (64 / 14, 64 / 14)
    offset = (0.5 * scale[0] - 0.5, 0.5 * scale[1] - 0.5)
    want = torch_grid_upsample(data, target, scale, offset)
    got = np.asarray(masks.upsample_bilinear(jnp.asarray(data), target))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_compose_scale_offset_resnet_like():
    # Five stride-2 (padded) reductions: scale 32, offset 0
    # (reference: upsample.py:56-60 docstring).
    configs = [(7, 1, 2, 3), (3, 1, 2, 1), (3, 1, 2, 1), (3, 1, 2, 1),
               (3, 1, 2, 1)]
    scale, offset = masks.compose_scale_offset(configs)
    assert scale == 32
    assert offset == 0.0


def test_sequence_data_size():
    configs = [(7, 1, 2, 3), (3, 1, 2, 1)]
    assert masks.sequence_data_size(configs, 224) == 56


def test_activation_mask_threshold():
    act = jnp.asarray(np.linspace(0, 1, 16).reshape(4, 4).astype(np.float32))
    mask = masks.activation_mask(act, jnp.asarray(0.5), (8, 8))
    mask = np.asarray(mask)
    assert mask.shape == (8, 8)
    assert mask.dtype == bool
    assert mask.any() and not mask.all()


def test_masked_image_composite():
    image = jnp.full((3, 4, 4), 200.0)
    mask = jnp.zeros((4, 4), bool).at[0, 0].set(True)
    out = np.asarray(masks.masked_image(image, mask, outside_bright=0.25))
    assert out.dtype == np.uint8
    assert out[0, 0, 0] == 200
    assert out[0, 1, 1] == 50


def test_resize_nearest_matches_torch():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((3, 17, 13)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(img)[None], size=(224, 224))[0].numpy()
    got = np.asarray(masks.resize_nearest(jnp.asarray(img), (224, 224)))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("size", [(7, 7), (14, 14), (56, 56), (3, 5)])
def test_resize_bilinear_matches_torch(size):
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 224, 224)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(img)[None], size=size, mode="bilinear",
        align_corners=False)[0].numpy()
    got = np.asarray(masks.resize_bilinear(jnp.asarray(img), size))
    np.testing.assert_allclose(got, want, atol=1e-4)
