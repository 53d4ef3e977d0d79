"""BigGAN generator as a pure JAX function with hookable stage taps.

Port of the pretorched BigGAN generator in the ``SeqBigGAN`` layering MILAN
dissects (reference: src/deps/pretorched/gans/biggan.py:196-460 for the
architecture, src/deps/ext/pretorched/gans/biggan.py:17-154 for the
``preprocess / layer0..layerN / attnK / output`` stage naming,
src/exemplars/models.py:189-218 for the dissection config). Instead of
wrapping modules in Sequentials to make layers hookable, ``apply`` simply
returns every stage's hidden state in its taps dict — the same functional
"just return it" convention as the rest of the zoo.

Faithfulness notes (all load-bearing for checkpoint parity):

- **Spectral norm at inference** (reference: layers/norm.py:27-101): one
  power-iteration step from the STORED ``u0`` buffer, without updating it:
  ``v = l2norm(u @ W); u' = l2norm(v @ Wᵀ); σ = (v @ Wᵀ) @ u'ᵀ``, then
  ``W̄ = W / σ``. The BigGAN factory pins ``SN_eps=1e-4``.
- **Class-conditional BN** (norm.py:337-395): eval-mode batch norm against
  ``stored_mean``/``stored_var`` (no affine, ``BN_eps=1e-4``), then
  ``out * (1 + gain(y)) + bias(y)`` with SN linears (no bias).
- **Hierarchical latent**: dim_z=140 split into 7 chunks of 20; chunk 0
  feeds the input linear, chunks 1..6 concat with the 128-d shared class
  embedding to condition each block (biggan.py:826-837,432-439).
- **SA-GAN attention** at resolution 128 (layers/attention.py:27-44).

Parameters are a flat dict keyed exactly like the torch Generator
``state_dict()`` (``shared.weight``, ``linear.*``, ``blocks.{i}.{j}.*``,
``output_layer.*``) so the published G_ema checkpoints import mechanically.
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["DIM_Z", "SHARED_DIM", "CH", "LAYERS", "init", "apply"]

Params = Dict[str, Array]

# BigGAN-256 configuration (reference: biggan.py:816-858).
DIM_Z = 140
SHARED_DIM = 128
CH = 96
BOTTOM_WIDTH = 4
RESOLUTION = 256
SN_EPS = 1e-4
BN_EPS = 1e-4

# arch[256] (reference: biggan.py:151-161): per-block channel multipliers,
# all blocks upsample 2x, attention at resolution 128 (after block 4).
IN_CH = tuple(CH * m for m in (16, 16, 8, 8, 4, 2))
OUT_CH = tuple(CH * m for m in (16, 8, 8, 4, 2, 1))
ATTN_INDEX = 4  # resolution 128

N_BLOCKS = len(IN_CH)
N_SLOTS = N_BLOCKS + 1
Z_CHUNK = DIM_Z // N_SLOTS  # 20

LAYERS = tuple(f"layer{i}" for i in range(N_BLOCKS))


def _l2norm(v: Array, eps: float) -> Array:
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def _sn_weight(params: Params, prefix: str, eps: float = SN_EPS) -> Array:
    """Spectrally-normalized weight from stored weight + u0 buffer."""
    weight = params[f"{prefix}.weight"]
    w_mat = weight.reshape(weight.shape[0], -1)  # (out, in*k*k)
    u = params[f"{prefix}.u0"].reshape(-1)  # (out,)
    v = _l2norm(u @ w_mat, eps)
    u_new = _l2norm(v @ w_mat.T, eps)
    sigma = (v @ w_mat.T) @ u_new
    return weight / sigma


def _sn_conv(params: Params, prefix: str, x: Array,
             padding: int = 1) -> Array:
    weight = _sn_weight(params, prefix)
    out = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    bias = params.get(f"{prefix}.bias")
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def _sn_linear(params: Params, prefix: str, x: Array) -> Array:
    out = x @ _sn_weight(params, prefix).T
    bias = params.get(f"{prefix}.bias")
    if bias is not None:
        out = out + bias
    return out


def _ccbn(params: Params, prefix: str, x: Array, y: Array) -> Array:
    """Class-conditional batch norm, eval mode (reference: norm.py:372-395)."""
    gain = 1.0 + _sn_linear(params, f"{prefix}.gain", y)
    bias = _sn_linear(params, f"{prefix}.bias", y)
    mean = params[f"{prefix}.stored_mean"]
    var = params[f"{prefix}.stored_var"]
    normed = (x - mean[None, :, None, None]) * jax.lax.rsqrt(
        var[None, :, None, None] + BN_EPS)
    return normed * gain[:, :, None, None] + bias[:, :, None, None]


def _upsample2x(x: Array) -> Array:
    """Nearest-neighbor 2x (torch F.interpolate(scale_factor=2) default)."""
    n, c, h, w = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :, None],
                            (n, c, h, 2, w, 2)).reshape(n, c, 2 * h, 2 * w)


def _gblock(params: Params, prefix: str, x: Array, y: Array) -> Array:
    """One generator residual block (reference: biggan.py:60-70)."""
    h = jax.nn.relu(_ccbn(params, f"{prefix}.bn1", x, y))
    h = _upsample2x(h)
    x = _upsample2x(x)
    h = _sn_conv(params, f"{prefix}.conv1", h)
    h = jax.nn.relu(_ccbn(params, f"{prefix}.bn2", h, y))
    h = _sn_conv(params, f"{prefix}.conv2", h)
    x = _sn_conv(params, f"{prefix}.conv_sc", x, padding=0)
    return h + x


def _attention(params: Params, prefix: str, x: Array) -> Array:
    """SA-GAN non-local block (reference: layers/attention.py:27-44)."""
    n, ch, height, width = x.shape
    theta = _sn_conv(params, f"{prefix}.theta", x, padding=0)
    phi = _sn_conv(params, f"{prefix}.phi", x, padding=0)
    g = _sn_conv(params, f"{prefix}.g", x, padding=0)

    def pool2(v: Array) -> Array:
        return jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
            "VALID")

    phi = pool2(phi).reshape(n, ch // 8, -1)
    g = pool2(g).reshape(n, ch // 2, -1)
    theta = theta.reshape(n, ch // 8, -1)

    beta = jax.nn.softmax(
        jnp.einsum("ncq,nck->nqk", theta, phi), axis=-1)
    o = jnp.einsum("nck,nqk->ncq", g, beta).reshape(
        n, ch // 2, height, width)
    o = _sn_conv(params, f"{prefix}.o", o, padding=0)
    return params[f"{prefix}.gamma"] * o + x


def apply(params: Params, z: Array, y: Array
          ) -> Tuple[Array, Dict[str, Array]]:
    """Generate images from latents, returning (images, stage taps).

    Args:
        params: torch-keyed generator parameters.
        z: (N, DIM_Z) latents.
        y: (N,) int class ids, or (N, n_classes) one-hot / soft labels.

    Returns:
        (images (N, 3, 256, 256) in [-1, 1],
         taps {preprocess, layer0..layer5, attn4, output}).
    """
    shared = params["shared.weight"]
    y = jnp.asarray(y)
    if y.ndim > 1:
        y_emb = y @ shared
    else:
        y_emb = shared[y]

    # Hierarchical latent: chunk 0 -> input linear; the rest condition
    # blocks (reference: biggan.py:432-439).
    z = jnp.asarray(z)
    chunks = [z[:, i * Z_CHUNK:(i + 1) * Z_CHUNK] for i in range(N_SLOTS)]
    ys = [jnp.concatenate([y_emb, chunk], axis=1) for chunk in chunks[1:]]

    h = _sn_linear(params, "linear", chunks[0])
    h = h.reshape(h.shape[0], -1, BOTTOM_WIDTH, BOTTOM_WIDTH)

    taps: Dict[str, Array] = {"preprocess": h}
    for index in range(N_BLOCKS):
        h = _gblock(params, f"blocks.{index}.0", h, ys[index])
        taps[f"layer{index}"] = h
        if index == ATTN_INDEX:
            h = _attention(params, f"blocks.{index}.1", h)
            taps[f"attn{index}"] = h

    # Output: plain BN (eps 1e-5) -> relu -> SN conv -> tanh
    # (reference: biggan.py:355-361, norm.py:430-440).
    mean = params["output_layer.0.stored_mean"]
    var = params["output_layer.0.stored_var"]
    h = (h - mean[None, :, None, None]) * jax.lax.rsqrt(
        var[None, :, None, None] + 1e-5)
    h = h * params["output_layer.0.gain"][None, :, None, None] + \
        params["output_layer.0.bias"][None, :, None, None]
    h = jax.nn.relu(h)
    h = _sn_conv(params, "output_layer.2", h)
    images = jnp.tanh(h)
    taps["output"] = images
    return images, taps


def init(key: PRNGKey, n_classes: int = 1000) -> Params:
    """Random-init parameters with the torch Generator's names/shapes."""
    params: Params = {}
    keys = iter(jax.random.split(key, 256))

    def sn_linear(prefix: str, out_size: int, in_size: int,
                  bias: bool = True) -> None:
        params[f"{prefix}.weight"] = (
            jax.random.normal(next(keys), (out_size, in_size)) * 0.02)
        if bias:
            params[f"{prefix}.bias"] = jnp.zeros((out_size,))
        params[f"{prefix}.u0"] = jax.random.normal(next(keys), (1, out_size))
        params[f"{prefix}.sv0"] = jnp.ones((1,))

    def sn_conv(prefix: str, out_ch: int, in_ch: int, kernel: int,
                bias: bool = True) -> None:
        params[f"{prefix}.weight"] = (
            jax.random.normal(next(keys),
                              (out_ch, in_ch, kernel, kernel)) * 0.02)
        if bias:
            params[f"{prefix}.bias"] = jnp.zeros((out_ch,))
        params[f"{prefix}.u0"] = jax.random.normal(next(keys), (1, out_ch))
        params[f"{prefix}.sv0"] = jnp.ones((1,))

    def ccbn(prefix: str, channels: int) -> None:
        sn_linear(f"{prefix}.gain", channels, SHARED_DIM + Z_CHUNK,
                  bias=False)
        sn_linear(f"{prefix}.bias", channels, SHARED_DIM + Z_CHUNK,
                  bias=False)
        params[f"{prefix}.stored_mean"] = jnp.zeros((channels,))
        params[f"{prefix}.stored_var"] = jnp.ones((channels,))

    params["shared.weight"] = (
        jax.random.normal(next(keys), (n_classes, SHARED_DIM)) * 0.02)
    sn_linear("linear", IN_CH[0] * BOTTOM_WIDTH ** 2, Z_CHUNK)

    for index in range(N_BLOCKS):
        prefix = f"blocks.{index}.0"
        ccbn(f"{prefix}.bn1", IN_CH[index])
        ccbn(f"{prefix}.bn2", OUT_CH[index])
        sn_conv(f"{prefix}.conv1", OUT_CH[index], IN_CH[index], 3)
        sn_conv(f"{prefix}.conv2", OUT_CH[index], OUT_CH[index], 3)
        sn_conv(f"{prefix}.conv_sc", OUT_CH[index], IN_CH[index], 1)
        if index == ATTN_INDEX:
            ch = OUT_CH[index]
            attn = f"blocks.{index}.1"
            sn_conv(f"{attn}.theta", ch // 8, ch, 1, bias=False)
            sn_conv(f"{attn}.phi", ch // 8, ch, 1, bias=False)
            sn_conv(f"{attn}.g", ch // 2, ch, 1, bias=False)
            sn_conv(f"{attn}.o", ch, ch // 2, 1, bias=False)
            params[f"{attn}.gamma"] = jnp.zeros(())

    params["output_layer.0.gain"] = jnp.ones((OUT_CH[-1],))
    params["output_layer.0.bias"] = jnp.zeros((OUT_CH[-1],))
    params["output_layer.0.stored_mean"] = jnp.zeros((OUT_CH[-1],))
    params["output_layer.0.stored_var"] = jnp.ones((OUT_CH[-1],))
    sn_conv("output_layer.2", 3, OUT_CH[-1], 3)
    return params
