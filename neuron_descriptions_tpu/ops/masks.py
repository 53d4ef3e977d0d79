"""Mask geometry: receptive-field-centered upsampling, thresholding,
and masked-image compositing.

TPU-native replacement for NetDissect's ``upsample.py`` + ``imgviz.py``
machinery (reference: src/deps/netdissect/upsample.py:5-155,
imgviz.py:118-198, and the ext variant src/deps/ext/netdissect/imgviz.py).

The reference builds a ``grid_sample(align_corners=True)`` grid whose math
reduces to: source feature coordinate ``p = (t - offset) / scale`` for target
pixel ``t`` (verified against upsample.py:124-155 — the [-1, 1] grid merely
re-encodes this affine map). We implement that directly as a separable
bilinear gather with zero padding, which XLA fuses with the threshold
compare into one VPU pass; no gather-grid tensors are materialized.

Receptive-field scale/offset composition (upsample.py:46-121) is pure Python
over static conv configs, evaluated at trace time.
"""
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "ConvConfig",
    "compose_scale_offset",
    "sequence_data_size",
    "upsample_bilinear",
    "activation_mask",
    "masked_image",
    "resize_nearest",
    "resize_bilinear",
]

# (kernel, dilation, stride, padding) — per spatial axis.
ConvConfig = Tuple[int, int, int, int]


def compose_scale_offset(
        configs: Sequence[ConvConfig]) -> Tuple[float, float]:
    """Compose conv layer configs into one (scale, offset) affine map.

    ``input_coord = output_coord * scale + offset`` preserving receptive
    field centers; coordinates measured with (0, 0) the upper-left corner of
    the first pixel (reference: upsample.py:85-96).
    """
    if not configs:
        return (1.0, 0.0)
    scale, offset = compose_scale_offset(configs[1:])
    kernel, dilation, stride, padding = configs[0]
    scale *= stride
    offset *= stride
    offset += (kernel - 1) * dilation / 2.0 - padding
    return scale, offset


def sequence_data_size(configs: Sequence[ConvConfig], size: int) -> int:
    """Apply conv configs to an input size to get the output size.

    Reference: upsample.py:99-106.
    """
    for kernel, dilation, stride, padding in configs:
        size = 1 + (size + 2 * padding - dilation * (kernel - 1) - 1) // stride
    return size


def _source_coords(target_size: int, source_size: int, scale: float,
                   offset: float) -> Array:
    """Continuous source pixel coordinate for each target pixel."""
    t = jnp.arange(target_size, dtype=jnp.float32)
    return (t - offset) / scale


def _default_scale_offset(target_size: int,
                          source_size: int) -> Tuple[float, float]:
    """NetDissect's default grid when no conv geometry is given.

    Reference: upsample.py:134-138 — scale fills the target, offset centers
    pixel grids on each other.
    """
    scale = float(target_size) / float(source_size)
    offset = 0.5 * scale - 0.5
    return scale, offset


def upsample_bilinear(
        data: Array,
        target_shape: Tuple[int, int],
        scale_offset: Optional[Tuple[Tuple[float, float],
                                     Tuple[float, float]]] = None,
        image_size: Optional[Tuple[int, int]] = None) -> Array:
    """Bilinearly upsample feature maps with receptive-field centering.

    Args:
        data: (..., h, w) feature maps.
        target_shape: (th, tw) output spatial size.
        scale_offset: ((yscale, yoffset), (xscale, xoffset)) mapping feature
            coords to *image* coords. If None, uses the default fill-target
            map (reference: upsample.py:134-138).
        image_size: When ``scale_offset`` maps to an image whose size differs
            from ``target_shape``, the size of that image; the map is then
            rescaled so the target is a uniform downsampling of it
            (reference: upsample.py:141-146).

    Returns:
        (..., th, tw) bilinearly sampled maps; samples outside the feature
        grid read as zero (grid_sample ``padding_mode='zeros'`` with
        ``align_corners=True`` — reference: upsample.py:30-43).
    """
    *lead, h, w = data.shape
    th, tw = target_shape

    if scale_offset is None:
        yscale, yoffset = _default_scale_offset(th, h)
        xscale, xoffset = _default_scale_offset(tw, w)
    else:
        (yscale, yoffset), (xscale, xoffset) = scale_offset
        if image_size is not None:
            ny, nx = image_size
            yscale = yscale * (th - 1) / (ny - 1)
            yoffset = yoffset * (th - 1) / (ny - 1)
            xscale = xscale * (tw - 1) / (nx - 1)
            xoffset = xoffset * (tw - 1) / (nx - 1)

    py = _source_coords(th, h, yscale, yoffset)  # (th,)
    px = _source_coords(tw, w, xscale, xoffset)  # (tw,)

    def gather_axis(coords: Array, size: int):
        lo = jnp.floor(coords).astype(jnp.int32)
        frac = coords - lo
        hi = lo + 1
        # Zero-padding: out-of-range taps contribute 0.
        lo_valid = (lo >= 0) & (lo < size)
        hi_valid = (hi >= 0) & (hi < size)
        lo_c = jnp.clip(lo, 0, size - 1)
        hi_c = jnp.clip(hi, 0, size - 1)
        w_lo = jnp.where(lo_valid, 1.0 - frac, 0.0)
        w_hi = jnp.where(hi_valid, frac, 0.0)
        return lo_c, hi_c, w_lo, w_hi

    ylo, yhi, wylo, wyhi = gather_axis(py, h)
    xlo, xhi, wxlo, wxhi = gather_axis(px, w)

    flat = data.reshape(-1, h, w)
    # Separable interpolation: rows first, then columns.
    rows = (flat[:, ylo, :] * wylo[None, :, None] +
            flat[:, yhi, :] * wyhi[None, :, None])  # (n, th, w)
    out = (rows[:, :, xlo] * wxlo[None, None, :] +
           rows[:, :, xhi] * wxhi[None, None, :])  # (n, th, tw)
    return out.reshape(*lead, th, tw)


def activation_mask(activations: Array,
                    level: Array,
                    target_shape: Tuple[int, int],
                    scale_offset=None,
                    image_size=None) -> Array:
    """Upsample activations and threshold into a binary mask.

    Equivalent to ``ImageVisualizer.pytorch_mask`` (reference:
    imgviz.py:185-198): ``upsample(act) > level``.

    Args:
        activations: (..., h, w) activation maps (one per unit/image).
        level: broadcastable to the leading dims — per-unit quantile
            threshold (reference: src/exemplars/compute.py:195).
        target_shape: Output (height, width).

    Returns:
        (..., th, tw) bool mask.
    """
    up = upsample_bilinear(activations, target_shape,
                           scale_offset=scale_offset, image_size=image_size)
    level = jnp.asarray(level)
    level = level.reshape(level.shape + (1,) * (up.ndim - level.ndim))
    return up > level


def masked_image(image: Array, mask: Array,
                 outside_bright: float = 0.25) -> Array:
    """Composite a byte image with its activation mask.

    Matches the reference's viz path with ``thickness=0`` (no border):
    inside pixels keep full brightness, outside pixels are dimmed
    (reference: ext/netdissect/imgviz.py:67-71 calling imgviz.py:118-145).

    Args:
        image: (..., 3, H, W) float image in byte range [0, 255].
        mask: (..., H, W) bool or {0,1} mask.
        outside_bright: Brightness multiplier outside the mask.

    Returns:
        (..., 3, H, W) uint8 composited image.
    """
    m = mask.astype(image.dtype)
    m = jnp.expand_dims(m, axis=-3)  # broadcast over channels
    out = image * m + outside_bright * image * (1.0 - m)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def resize_nearest(image: Array, target_shape: Tuple[int, int]) -> Array:
    """Nearest-neighbor resize with torch ``interpolate(mode='nearest')``
    index math (``src = floor(dst * in/out)``).

    The reference resizes visualization images this way
    (reference: imgviz.py:200-210 — default interpolate mode is nearest).

    Args:
        image: (..., H, W) array.
    """
    *lead, h, w = image.shape
    th, tw = target_shape
    ys = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return image[..., ys, :][..., :, xs]


def resize_bilinear(image: Array, target_shape: Tuple[int, int],
                    align_corners: bool = False) -> Array:
    """Bilinear resize matching torch ``F.interpolate(mode='bilinear')``.

    Used for downsampling masks to feature resolution in the pyramid encoder
    (reference: src/milan/encoders.py:304-307, align_corners=False).
    """
    *lead, h, w = image.shape
    th, tw = target_shape

    def coords(ts: int, ss: int) -> Array:
        t = jnp.arange(ts, dtype=jnp.float32)
        if align_corners:
            if ts == 1:
                return jnp.zeros((ts,), jnp.float32)
            return t * ((ss - 1) / (ts - 1))
        # torch half-pixel centers, clamped at 0 (torch clamps negatives).
        return jnp.maximum((t + 0.5) * (ss / ts) - 0.5, 0.0)

    py = coords(th, h)
    px = coords(tw, w)

    def taps(c: Array, size: int):
        lo = jnp.floor(c).astype(jnp.int32)
        frac = c - lo
        lo = jnp.clip(lo, 0, size - 1)
        hi = jnp.clip(lo + 1, 0, size - 1)
        return lo, hi, frac

    ylo, yhi, fy = taps(py, h)
    xlo, xhi, fx = taps(px, w)

    flat = image.reshape(-1, h, w)
    rows = (flat[:, ylo, :] * (1 - fy)[None, :, None] +
            flat[:, yhi, :] * fy[None, :, None])
    out = (rows[:, :, xlo] * (1 - fx)[None, None, :] +
           rows[:, :, xhi] * fx[None, None, :])
    return out.reshape(*lead, th, tw)
