"""DINO-style Vision Transformer (ViT-S/8) as a pure JAX function.

Replaces the reference's ``torch.hub.load('facebookresearch/dino', ...)``
subject model (reference: src/exemplars/models.py:237-247). Parameters are
keyed by the DINO checkpoint's ``state_dict()`` names so import is a copy.

The dissection tap is each block's MLP hidden layer ``blocks.N.mlp.fc1``
with shape (batch, 1 + patches, units); the exemplars pipeline spatializes
it by dropping the CLS token (reference: src/exemplars/transforms.py:55-81).
"""
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["apply", "init", "LAYERS", "VITS8"]

Params = Dict[str, Array]

# (embed_dim, depth, heads, mlp_ratio, patch)
VITS8 = dict(embed_dim=384, depth=12, heads=6, mlp_ratio=4, patch=8)

LAYERS = tuple(f"blocks.{i}.mlp.fc1" for i in range(12))


def _layer_norm(x: Array, weight: Array, bias: Array,
                eps: float = 1e-6) -> Array:
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


def _cubic_kernel(t: Array, a: float = -0.75) -> Array:
    """Keys cubic convolution weight, torch's a=-0.75 variant."""
    at = jnp.abs(t)
    w1 = ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    w2 = ((a * at - 5.0 * a) * at + 8.0 * a) * at - 4.0 * a
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _resize_bicubic(x: Array, out_h: int, out_w: int) -> Array:
    """Separable bicubic resize matching torch ``F.interpolate(mode=
    'bicubic', align_corners=False)`` (half-pixel centers, a=-0.75,
    edge-clamped taps). Operates on (..., H, W)."""
    def resize_axis(data: Array, in_size: int, out_size: int) -> Array:
        # Resizes the LAST axis.
        src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        base = jnp.floor(src).astype(jnp.int32)
        taps = jnp.stack([base - 1, base, base + 1, base + 2])  # (4, out)
        weights = _cubic_kernel(src[None] - taps.astype(src.dtype))  # (4,out)
        taps = jnp.clip(taps, 0, in_size - 1)
        return jnp.einsum("...to,to->...o", data[..., taps], weights)

    x = jnp.swapaxes(resize_axis(jnp.swapaxes(x, -1, -2), x.shape[-2],
                                 out_h), -1, -2)
    return resize_axis(x, x.shape[-1], out_w)


def _interpolate_pos_embed(pos: Array, n_patches: int) -> Array:
    """Bicubic pos-embed resize: DINO interpolates when the patch grid
    differs from training size (torch bicubic semantics; grids match for
    224/8 inputs so this path is only taken at non-224 eval sizes)."""
    n_trained = pos.shape[1] - 1
    if n_trained == n_patches:
        return pos
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    old = int(math.isqrt(n_trained))
    new = int(math.isqrt(n_patches))
    dim = grid_pos.shape[-1]
    grid = grid_pos.reshape(1, old, old, dim)
    grid = jnp.moveaxis(grid, -1, 1)  # (1, dim, old, old)
    grid = _resize_bicubic(grid, new, new)
    grid = jnp.moveaxis(grid, 1, -1)
    return jnp.concatenate([cls_pos, grid.reshape(1, new * new, dim)],
                           axis=1)


def apply(params: Params, x: Array, config: dict = VITS8
          ) -> Tuple[Array, Dict[str, Array]]:
    """Run the ViT, returning (CLS embedding, {blocks.N.mlp.fc1: acts}).

    Args:
        x: (N, 3, H, W) images with H, W divisible by the patch size.
    """
    dim, depth, heads = config["embed_dim"], config["depth"], config["heads"]
    patch = config["patch"]
    n, _, h, w = x.shape

    # Patch embedding: conv patch x patch stride patch.
    emb = jax.lax.conv_general_dilated(
        x, params["patch_embed.proj.weight"],
        window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    emb = emb + params["patch_embed.proj.bias"][None, :, None, None]
    emb = emb.reshape(n, dim, -1).transpose(0, 2, 1)  # (N, P, dim)
    n_patches = emb.shape[1]

    cls = jnp.broadcast_to(params["cls_token"], (n, 1, dim))
    tokens = jnp.concatenate([cls, emb], axis=1)
    tokens = tokens + _interpolate_pos_embed(params["pos_embed"], n_patches)

    acts: Dict[str, Array] = {}
    head_dim = dim // heads
    scale = head_dim ** -0.5

    for i in range(depth):
        p = f"blocks.{i}"
        y = _layer_norm(tokens, params[f"{p}.norm1.weight"],
                        params[f"{p}.norm1.bias"])
        qkv = y @ params[f"{p}.attn.qkv.weight"].T + params[
            f"{p}.attn.qkv.bias"]
        qkv = qkv.reshape(n, -1, 3, heads, head_dim)
        q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
        attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * scale, axis=-1)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(n, -1, dim)
        y = y @ params[f"{p}.attn.proj.weight"].T + params[
            f"{p}.attn.proj.bias"]
        tokens = tokens + y

        y = _layer_norm(tokens, params[f"{p}.norm2.weight"],
                        params[f"{p}.norm2.bias"])
        hidden = y @ params[f"{p}.mlp.fc1.weight"].T + params[
            f"{p}.mlp.fc1.bias"]
        acts[f"{p}.mlp.fc1"] = hidden
        y = jax.nn.gelu(hidden, approximate=False)
        y = y @ params[f"{p}.mlp.fc2.weight"].T + params[f"{p}.mlp.fc2.bias"]
        tokens = tokens + y

    tokens = _layer_norm(tokens, params["norm.weight"], params["norm.bias"])
    return tokens[:, 0], acts


def init(key: PRNGKey, config: dict = VITS8,
         image_size: int = 224) -> Params:
    """Random-init DINO-shaped ViT parameters."""
    dim, depth = config["embed_dim"], config["depth"]
    patch, ratio = config["patch"], config["mlp_ratio"]
    hidden = dim * ratio
    grid = image_size // patch
    params: Params = {}
    keys = iter(jax.random.split(key, 16 * depth + 16))

    def lin(name: str, o: int, i: int) -> None:
        std = (1.0 / i) ** 0.5
        params[f"{name}.weight"] = jax.random.normal(next(keys),
                                                     (o, i)) * std
        params[f"{name}.bias"] = jnp.zeros((o,))

    def norm(name: str) -> None:
        params[f"{name}.weight"] = jnp.ones((dim,))
        params[f"{name}.bias"] = jnp.zeros((dim,))

    params["cls_token"] = jax.random.normal(next(keys), (1, 1, dim)) * 0.02
    params["pos_embed"] = (
        jax.random.normal(next(keys), (1, grid * grid + 1, dim)) * 0.02)
    params["patch_embed.proj.weight"] = (
        jax.random.normal(next(keys), (dim, 3, patch, patch)) * 0.02)
    params["patch_embed.proj.bias"] = jnp.zeros((dim,))
    for i in range(depth):
        p = f"blocks.{i}"
        norm(f"{p}.norm1")
        lin(f"{p}.attn.qkv", 3 * dim, dim)
        lin(f"{p}.attn.proj", dim, dim)
        norm(f"{p}.norm2")
        lin(f"{p}.mlp.fc1", hidden, dim)
        lin(f"{p}.mlp.fc2", dim, hidden)
    norm("norm")
    return params
