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


def _interpolate_pos_embed(pos: Array, n_patches: int) -> Array:
    """Bicubic-free pos-embed resize (bilinear): DINO interpolates when the
    grid differs from training size. Grids match for 224/8 inputs, so this
    path is rarely taken; bilinear is a documented approximation."""
    n_trained = pos.shape[1] - 1
    if n_trained == n_patches:
        return pos
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    old = int(math.isqrt(n_trained))
    new = int(math.isqrt(n_patches))
    grid = grid_pos.reshape(1, old, old, -1)
    grid = jax.image.resize(grid, (1, new, new, grid.shape[-1]), "bilinear")
    return jnp.concatenate([cls_pos, grid.reshape(1, new * new, -1)], axis=1)


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
