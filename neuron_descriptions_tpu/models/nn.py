"""Pure-function NN primitives with torch parameter-layout parity.

The subject-model zoo (reference: src/exemplars/models.py, vendored model
defs in src/deps/) is rebuilt as pure JAX functions over flat parameter
dicts keyed exactly like torch ``state_dict()`` entries. That choice makes
pretrained-weight import a mechanical tensor copy and keeps every model a
trivially jit/vmap/pjit-able function — the TPU-idiomatic replacement for
the reference's nethook forward-monkeypatching (SURVEY.md §7: "functional
model defs that *return* intermediates").

Interfaces use NCHW / OIHW (torch's layout) so imported weights need no
transposition; XLA lays out and fuses for the MXU regardless of the logical
layout.
"""
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "conv2d",
    "batch_norm",
    "relu",
    "max_pool2d",
    "avg_pool2d",
    "adaptive_avg_pool2d",
    "linear",
    "local_response_norm",
    "softmax",
    "log_softmax",
]

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore


def conv2d(x: Array,
           weight: Array,
           bias: Optional[Array] = None,
           stride: IntOrPair = 1,
           padding: IntOrPair = 0,
           dilation: IntOrPair = 1,
           groups: int = 1) -> Array:
    """2D convolution, torch ``nn.Conv2d`` semantics.

    Args:
        x: (N, C, H, W) input.
        weight: (O, C/groups, kh, kw) torch-layout kernel.
        bias: (O,) optional bias.
    """
    ph, pw = _pair(padding)
    out = jax.lax.conv_general_dilated(
        x, weight,
        window_strides=_pair(stride),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=_pair(dilation),
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def batch_norm(x: Array, weight: Array, bias: Array, running_mean: Array,
               running_var: Array, eps: float = 1e-5) -> Array:
    """Inference-mode batch norm (subject models are frozen)."""
    scale = weight * jax.lax.rsqrt(running_var + eps)
    shift = bias - running_mean * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


def max_pool2d(x: Array, kernel: IntOrPair, stride: Optional[IntOrPair] = None,
               padding: IntOrPair = 0) -> Array:
    """Max pooling, torch ``nn.MaxPool2d`` semantics (ceil_mode=False)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding=[(0, 0), (0, 0), (ph, ph), (pw, pw)],
    )


def avg_pool2d(x: Array, kernel: IntOrPair, stride: Optional[IntOrPair] = None,
               padding: IntOrPair = 0,
               count_include_pad: bool = True) -> Array:
    """Average pooling, torch ``nn.AvgPool2d`` semantics."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding=[(0, 0), (0, 0), (ph, ph), (pw, pw)],
    )
    if count_include_pad or (ph == 0 and pw == 0):
        return summed / (kh * kw)
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding=[(0, 0), (0, 0), (ph, ph), (pw, pw)],
    )
    return summed / counts


def adaptive_avg_pool2d(x: Array, output_size: IntOrPair) -> Array:
    """Adaptive average pooling, torch semantics.

    Bin i spans [floor(i*S/O), ceil((i+1)*S/O)) — all static shapes, so the
    gather plan compiles once per (input, output) size pair.
    """
    oh, ow = _pair(output_size)
    n, c, h, w = x.shape

    def pool_axis(data: Array, in_size: int, out_size: int,
                  axis: int) -> Array:
        if in_size == out_size:
            return data
        segments = []
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -(-((i + 1) * in_size) // out_size)  # ceil division
            seg = jax.lax.slice_in_dim(data, start, end, axis=axis)
            segments.append(seg.mean(axis=axis, keepdims=True))
        return jnp.concatenate(segments, axis=axis)

    x = pool_axis(x, h, oh, axis=2)
    x = pool_axis(x, w, ow, axis=3)
    return x


def linear(x: Array, weight: Array, bias: Optional[Array] = None) -> Array:
    """Torch ``nn.Linear``: weight is (out, in)."""
    out = x @ weight.T
    if bias is not None:
        out = out + bias
    return out


def local_response_norm(x: Array, size: int, alpha: float = 1e-4,
                        beta: float = 0.75, k: float = 1.0) -> Array:
    """Cross-channel LRN, torch ``nn.LocalResponseNorm`` semantics.

    Used by the Caffe-style places365 AlexNet (reference:
    src/deps/alexnet.py:88-119, with k=1.0 via its AvgPool3d trick).
    """
    sq = x * x
    pad = ((size - 1) // 2, size - 1 - (size - 1) // 2)
    summed = jax.lax.reduce_window(
        sq, 0.0, jax.lax.add,
        window_dimensions=(1, size, 1, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), pad, (0, 0), (0, 0)],
    )
    div = (summed / size * alpha + k) ** beta
    return x / div


def softmax(x: Array, axis: int = -1) -> Array:
    return jax.nn.softmax(x, axis=axis)


def log_softmax(x: Array, axis: int = -1) -> Array:
    return jax.nn.log_softmax(x, axis=axis)
