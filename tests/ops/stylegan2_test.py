"""Tests for the StyleGAN2 native-op equivalents.

The torch replica implements the op's reference semantics explicitly
(zero-stuff → pad/crop → correlate with flipped kernel → stride), matching
the CUDA kernel's contract (reference:
src/deps/pretorched/gans/stylegan2/op/upfirdn2d_kernel.cu).
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu.ops import stylegan2

torch = pytest.importorskip("torch")
from torch.nn import functional as F  # noqa: E402


def upfirdn2d_torch(x, kernel, up, down, pad):
    """Reference-semantics implementation in torch."""
    up_x = up_y = up
    down_x = down_y = down
    pad_x0, pad_x1 = pad
    pad_y0, pad_y1 = pad

    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape
    out = x.reshape(-1, in_h, 1, in_w, 1)
    out = F.pad(out, [0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.reshape(-1, in_h * up_y, in_w * up_x)

    out = F.pad(out, [max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0),
                      max(pad_y1, 0)])
    out = out[:, max(-pad_y0, 0):out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0):out.shape[2] - max(-pad_x1, 0)]

    out = out[:, None]
    w = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw)
    out = F.conv2d(out, w)
    out = out[:, 0, ::down_y, ::down_x]
    return out.reshape(n, c, out.shape[1], out.shape[2])


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)),
    (2, 1, (2, 1)),
    (1, 2, (1, 2)),
    (2, 2, (2, 2)),
    (2, 1, (-1, 2)),  # negative padding crops
])
def test_upfirdn2d_matches_reference_semantics(rng, up, down, pad):
    x = rng.normal(size=(2, 3, 9, 11)).astype(np.float32)
    kernel = rng.normal(size=(4, 4)).astype(np.float32)

    ours = np.asarray(stylegan2.upfirdn2d(jnp.asarray(x),
                                          jnp.asarray(kernel), up=up,
                                          down=down, pad=pad))
    expected = upfirdn2d_torch(torch.from_numpy(x),
                               torch.from_numpy(kernel), up, down,
                               pad).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_fused_leaky_relu_matches_torch(rng):
    x = rng.normal(size=(2, 4, 5, 5)).astype(np.float32)
    bias = rng.normal(size=(4,)).astype(np.float32)
    ours = np.asarray(stylegan2.fused_leaky_relu(jnp.asarray(x),
                                                 jnp.asarray(bias)))
    expected = (F.leaky_relu(
        torch.from_numpy(x) + torch.from_numpy(bias).view(1, -1, 1, 1),
        negative_slope=0.2) * math.sqrt(2.0)).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_make_kernel_normalized():
    kernel = np.asarray(stylegan2.make_kernel([1, 3, 3, 1]))
    assert kernel.shape == (4, 4)
    assert kernel.sum() == pytest.approx(1.0)


def test_upsample_downsample_round_shapes(rng):
    x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
    kernel = stylegan2.make_kernel([1, 3, 3, 1])
    up = stylegan2.upsample2x(jnp.asarray(x), kernel)
    assert up.shape == (1, 2, 16, 16)
    down = stylegan2.downsample2x(jnp.asarray(x), kernel)
    assert down.shape == (1, 2, 4, 4)
    blurred = stylegan2.blur(jnp.asarray(x), kernel, pad=(2, 1))
    assert blurred.shape == (1, 2, 8, 8)
