"""Torchvision MobileNetV2 as a pure JAX function with taps.

Dissected by the reference's neuron catalog / audit paths (reference:
src/exemplars/models.py LAYERS.MOBILENET_V2 = ``features.{0,2,...,18}``,
hooking whole feature-block outputs). Torch state-dict key parity:
``features.N.conv.M...`` inverted-residual naming.
"""
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import nn
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["LAYERS", "SETTINGS", "apply", "init"]

Params = Dict[str, Array]

# (expand_ratio, out_channels, repeats, stride) — the MobileNetV2 paper's
# inverted-residual schedule.
SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

LAYERS = tuple(f"features.{i}" for i in range(0, 19, 2))


def _relu6(x: Array) -> Array:
    return jnp.clip(x, 0.0, 6.0)


def _conv_bn(params: Params, prefix: str, x: Array, stride: int = 1,
             padding: int = 0, groups: int = 1, relu: bool = True) -> Array:
    x = nn.conv2d(x, params[f"{prefix}.0.weight"], stride=stride,
                  padding=padding, groups=groups)
    x = nn.batch_norm(x, params[f"{prefix}.1.weight"],
                      params[f"{prefix}.1.bias"],
                      params[f"{prefix}.1.running_mean"],
                      params[f"{prefix}.1.running_var"])
    return _relu6(x) if relu else x


def _inverted_residual(params: Params, prefix: str, x: Array,
                       expand: int, stride: int, in_ch: int,
                       out_ch: int) -> Array:
    identity = x
    h = x
    if expand != 1:
        h = _conv_bn(params, f"{prefix}.conv.0", h)  # 1x1 expand
        dw, proj_conv, proj_bn = "conv.1", "conv.2", "conv.3"
    else:
        dw, proj_conv, proj_bn = "conv.0", "conv.1", "conv.2"
    hidden = in_ch * expand
    h = _conv_bn(params, f"{prefix}.{dw}", h, stride=stride, padding=1,
                 groups=hidden)  # depthwise
    h = nn.conv2d(h, params[f"{prefix}.{proj_conv}.weight"])  # project
    h = nn.batch_norm(h, params[f"{prefix}.{proj_bn}.weight"],
                      params[f"{prefix}.{proj_bn}.bias"],
                      params[f"{prefix}.{proj_bn}.running_mean"],
                      params[f"{prefix}.{proj_bn}.running_var"])
    if stride == 1 and in_ch == out_ch:
        h = h + identity
    return h


def _block_plan():
    """Yield (features index, expand, stride, in_ch, out_ch)."""
    index, in_ch = 1, 32
    for expand, out_ch, repeats, stride in SETTINGS:
        for repeat in range(repeats):
            yield index, expand, (stride if repeat == 0 else 1), in_ch, out_ch
            in_ch = out_ch
            index += 1


def apply(params: Params, x: Array,
          edits: Optional[Mapping[str, Callable[[Array], Array]]] = None
          ) -> Tuple[Array, Dict[str, Array]]:
    """Run MobileNetV2, returning (logits, {features.N: block outputs}).

    ``edits`` rewrites a tap mid-forward (functional
    nethook.edit_layer, reference: src/deps/netdissect/nethook.py:117-136).
    """
    acts: Dict[str, Array] = {}
    edits = edits or {}

    def tap(name: str, value: Array) -> Array:
        if name in edits:
            value = edits[name](value)
        acts[name] = value
        return value

    h = _conv_bn(params, "features.0", x, stride=2, padding=1)
    h = tap("features.0", h)
    for index, expand, stride, in_ch, out_ch in _block_plan():
        h = _inverted_residual(params, f"features.{index}", h, expand,
                               stride, in_ch, out_ch)
        h = tap(f"features.{index}", h)
    h = _conv_bn(params, "features.18", h)
    h = tap("features.18", h)
    pooled = h.mean(axis=(2, 3))
    logits = nn.linear(pooled, params["classifier.1.weight"],
                       params["classifier.1.bias"])
    return logits, acts


def init(key: PRNGKey, num_classes: int = 1000) -> Params:
    """Random-init parameters with the torch names/shapes."""
    params: Params = {}
    keys = iter(jax.random.split(key, 1024))

    def conv_bn(prefix: str, o: int, i: int, k: int, groups: int = 1) -> None:
        std = (2.0 / (i // groups * k * k)) ** 0.5
        params[f"{prefix}.0.weight"] = (
            jax.random.normal(next(keys), (o, i // groups, k, k)) * std)
        params[f"{prefix}.1.weight"] = jnp.ones((o,))
        params[f"{prefix}.1.bias"] = jnp.zeros((o,))
        params[f"{prefix}.1.running_mean"] = jnp.zeros((o,))
        params[f"{prefix}.1.running_var"] = jnp.ones((o,))

    conv_bn("features.0", 32, 3, 3)
    for index, expand, _stride, in_ch, out_ch in _block_plan():
        prefix = f"features.{index}"
        hidden = in_ch * expand
        if expand != 1:
            conv_bn(f"{prefix}.conv.0", hidden, in_ch, 1)
            dw, proj_conv, proj_bn = "conv.1", "conv.2", "conv.3"
        else:
            dw, proj_conv, proj_bn = "conv.0", "conv.1", "conv.2"
        conv_bn(f"{prefix}.{dw}", hidden, hidden, 3, groups=hidden)
        std = (2.0 / hidden) ** 0.5
        params[f"{prefix}.{proj_conv}.weight"] = (
            jax.random.normal(next(keys), (out_ch, hidden, 1, 1)) * std)
        params[f"{prefix}.{proj_bn}.weight"] = jnp.ones((out_ch,))
        params[f"{prefix}.{proj_bn}.bias"] = jnp.zeros((out_ch,))
        params[f"{prefix}.{proj_bn}.running_mean"] = jnp.zeros((out_ch,))
        params[f"{prefix}.{proj_bn}.running_var"] = jnp.ones((out_ch,))
    conv_bn("features.18", 1280, 320, 1)

    std = (1.0 / 1280) ** 0.5
    params["classifier.1.weight"] = (
        jax.random.normal(next(keys), (num_classes, 1280)) * std)
    params["classifier.1.bias"] = jnp.zeros((num_classes,))
    return params
