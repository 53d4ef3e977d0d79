"""Primitive-op parity tests vs torch."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from neuron_descriptions_tpu.models import nn  # noqa: E402


def rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_conv2d_matches_torch():
    x = rand(2, 3, 16, 16)
    w = rand(8, 3, 3, 3, seed=1)
    b = rand(8, seed=2)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride=2, padding=1).numpy()
    got = np.asarray(nn.conv2d(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(b), stride=2, padding=1))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_grouped_conv_matches_torch():
    x = rand(2, 4, 8, 8)
    w = rand(6, 2, 3, 3, seed=1)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1,
                    groups=2).numpy()
    got = np.asarray(nn.conv2d(jnp.asarray(x), jnp.asarray(w), padding=1,
                               groups=2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_batch_norm_matches_torch():
    x = rand(2, 5, 4, 4)
    weight, bias = rand(5, seed=1), rand(5, seed=2)
    mean, var = rand(5, seed=3), np.abs(rand(5, seed=4)) + 0.5
    want = F.batch_norm(torch.from_numpy(x), torch.from_numpy(mean),
                        torch.from_numpy(var), torch.from_numpy(weight),
                        torch.from_numpy(bias), training=False).numpy()
    got = np.asarray(nn.batch_norm(jnp.asarray(x), jnp.asarray(weight),
                                   jnp.asarray(bias), jnp.asarray(mean),
                                   jnp.asarray(var)))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("kernel,stride,padding", [(3, 2, 0), (3, 2, 1),
                                                   (2, 2, 0)])
def test_max_pool_matches_torch(kernel, stride, padding):
    x = rand(2, 3, 15, 15)
    want = F.max_pool2d(torch.from_numpy(x), kernel, stride,
                        padding).numpy()
    got = np.asarray(nn.max_pool2d(jnp.asarray(x), kernel, stride, padding))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("out_size", [1, 6, 7])
def test_adaptive_avg_pool_matches_torch(out_size):
    x = rand(2, 3, 13, 13)
    want = F.adaptive_avg_pool2d(torch.from_numpy(x), out_size).numpy()
    got = np.asarray(nn.adaptive_avg_pool2d(jnp.asarray(x), out_size))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_local_response_norm_matches_torch():
    x = rand(2, 16, 5, 5)
    want = F.local_response_norm(torch.from_numpy(x), 5, alpha=1e-4,
                                 beta=0.75, k=1.0).numpy()
    got = np.asarray(nn.local_response_norm(jnp.asarray(x), 5, alpha=1e-4,
                                            beta=0.75, k=1.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avg_pool_matches_torch():
    x = rand(2, 3, 8, 8)
    want = F.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    got = np.asarray(nn.avg_pool2d(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, want, atol=1e-6)
