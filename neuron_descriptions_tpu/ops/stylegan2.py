"""StyleGAN2's native resampling ops as XLA programs.

The reference vendors two CUDA kernels for StyleGAN2
(reference: src/deps/pretorched/gans/stylegan2/op/upfirdn2d_kernel.cu,
fused_bias_act_kernel.cu, JIT-loaded in op/upfirdn2d.py:9 and
op/fused_act.py:10). They are off MILAN's dissection path (BigGAN is the
generative subject model — SURVEY.md §2.6) but belong to the native-op
census, so the rebuild provides TPU-native equivalents:

- ``upfirdn2d``: upsample-by-zero-stuffing → pad → FIR filter → downsample,
  expressed as ONE ``lax.conv_general_dilated`` (lhs_dilation = the zero
  stuffing, negative padding = the crop, window_strides = the
  downsampling) — the XLA convolution lowers straight onto the MXU, which
  is the TPU analog of the hand-written CUDA kernel.
- ``fused_leaky_relu``: bias + leaky ReLU + gain in one fused elementwise
  expression (XLA fuses it into neighboring ops, as the reference's
  ``fused_bias_act`` kernel does by hand).

Convenience wrappers (``upsample2x``, ``downsample2x``, ``blur``) mirror
how stylegan2/models.py composes the primitive.
"""
import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "upfirdn2d",
    "fused_leaky_relu",
    "make_kernel",
    "upsample2x",
    "downsample2x",
    "blur",
]

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore


def upfirdn2d(x: Array,
              kernel: Array,
              up: IntPair = 1,
              down: IntPair = 1,
              pad: Sequence[int] = (0, 0)) -> Array:
    """Upsample, FIR filter, downsample (StyleGAN2 semantics).

    Args:
        x: (N, C, H, W) input.
        kernel: (kh, kw) FIR filter.
        up / down: Integer resampling factors (per axis if a pair).
        pad: (pad0, pad1) applied to both spatial axes, or
            (x0, x1, y0, y1). Negative values crop.

    Returns:
        (N, C, H', W') with
        ``H' = (H*up_y + pad_y0 + pad_y1 - kh) // down_y + 1``.
    """
    up_x, up_y = _pair(up)
    down_x, down_y = _pair(down)
    if len(pad) == 2:
        pad_x0, pad_x1 = pad
        pad_y0, pad_y1 = pad
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    n, c, h, w = x.shape
    kernel = jnp.asarray(kernel, x.dtype)
    # The native kernel correlates with the flipped filter (convolution);
    # XLA's conv is correlation, so flip here.
    rhs = jnp.flip(kernel, (0, 1))[None, None]

    # lhs_dilation yields (h-1)*up+1 samples; the reference zero-stuffs to
    # h*up (up-1 trailing zeros) — fold those zeros into trailing padding.
    out = jax.lax.conv_general_dilated(
        x.reshape(n * c, 1, h, w), rhs,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1),
                 (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(n, c, out.shape[2], out.shape[3])


def fused_leaky_relu(x: Array,
                     bias: Array,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> Array:
    """Bias + leaky ReLU + gain (reference: op/fused_act.py semantics)."""
    x = x + bias.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def make_kernel(taps: Sequence[float]) -> Array:
    """Build the normalized 2D separable blur kernel stylegan2 uses
    (outer product of the 1D taps, sum-normalized)."""
    k = jnp.asarray(taps, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum()


def upsample2x(x: Array, kernel: Array) -> Array:
    """2x upsample + blur (stylegan2 ``Upsample`` module composition)."""
    kernel = jnp.asarray(kernel) * 4.0
    kh, kw = kernel.shape
    pad0 = (kh + 1) // 2
    pad1 = (kh - 1) // 2
    return upfirdn2d(x, kernel, up=2, down=1, pad=(pad0, pad1))


def downsample2x(x: Array, kernel: Array) -> Array:
    """Blur + 2x downsample (stylegan2 ``Downsample`` composition)."""
    kernel = jnp.asarray(kernel)
    kh, _ = kernel.shape
    pad0 = (kh - 1) // 2
    pad1 = kh // 2
    return upfirdn2d(x, kernel, up=1, down=2, pad=(pad0, pad1))


def blur(x: Array, kernel: Array, pad: Sequence[int]) -> Array:
    """Plain FIR blur (stylegan2 ``Blur`` module)."""
    return upfirdn2d(x, jnp.asarray(kernel), pad=pad)
