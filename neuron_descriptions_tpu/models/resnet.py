"""Torchvision-architecture ResNets as pure JAX functions with layer taps.

Replaces the reference's use of torchvision resnet18/34/50/101/152 +
``resnet18_seq``/``resnet152_seq`` flattening + nethook layer retention
(reference: src/deps/ext/torchvision/models.py:50-85,
src/exemplars/models.py:259-326). Instead of hooking, ``apply`` simply
returns the tapped intermediates:

- ``conv1``: raw output of the stem convolution (pre-BN/ReLU — matching a
  torch hook on the ``conv1`` module);
- ``layer1``..``layer4``: post-ReLU block-stack outputs.

Parameters are a flat dict keyed exactly like ``state_dict()`` of the torch
model, so pretrained-weight import is a mechanical copy.
"""
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import nn
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["CONFIGS", "init", "apply", "LAYERS"]

Params = Dict[str, Array]

# depth -> (block type, blocks per stage)
CONFIGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

LAYERS = ("conv1", "layer1", "layer2", "layer3", "layer4")

_STAGE_WIDTHS = (64, 128, 256, 512)


def _bn_params(params: Params, prefix: str):
    return (params[f"{prefix}.weight"], params[f"{prefix}.bias"],
            params[f"{prefix}.running_mean"], params[f"{prefix}.running_var"])


def _basic_block(params: Params, prefix: str, x: Array,
                 stride: int) -> Array:
    identity = x
    out = nn.conv2d(x, params[f"{prefix}.conv1.weight"], stride=stride,
                    padding=1)
    out = nn.batch_norm(out, *_bn_params(params, f"{prefix}.bn1"))
    out = nn.relu(out)
    out = nn.conv2d(out, params[f"{prefix}.conv2.weight"], padding=1)
    out = nn.batch_norm(out, *_bn_params(params, f"{prefix}.bn2"))
    if f"{prefix}.downsample.0.weight" in params:
        identity = nn.conv2d(x, params[f"{prefix}.downsample.0.weight"],
                             stride=stride)
        identity = nn.batch_norm(
            identity, *_bn_params(params, f"{prefix}.downsample.1"))
    return nn.relu(out + identity)


def _bottleneck_block(params: Params, prefix: str, x: Array,
                      stride: int) -> Array:
    identity = x
    out = nn.conv2d(x, params[f"{prefix}.conv1.weight"])
    out = nn.batch_norm(out, *_bn_params(params, f"{prefix}.bn1"))
    out = nn.relu(out)
    out = nn.conv2d(out, params[f"{prefix}.conv2.weight"], stride=stride,
                    padding=1)
    out = nn.batch_norm(out, *_bn_params(params, f"{prefix}.bn2"))
    out = nn.relu(out)
    out = nn.conv2d(out, params[f"{prefix}.conv3.weight"])
    out = nn.batch_norm(out, *_bn_params(params, f"{prefix}.bn3"))
    if f"{prefix}.downsample.0.weight" in params:
        identity = nn.conv2d(x, params[f"{prefix}.downsample.0.weight"],
                             stride=stride)
        identity = nn.batch_norm(
            identity, *_bn_params(params, f"{prefix}.downsample.1"))
    return nn.relu(out + identity)


def apply(params: Params, x: Array, depth: int = 18,
          edits: Optional[Mapping[str, Callable[[Array], Array]]] = None
          ) -> Tuple[Array, Dict[str, Array]]:
    """Run the ResNet, returning (logits, {layer: activations}).

    Args:
        params: torch-keyed parameter dict.
        x: (N, 3, H, W) images (already normalized).
        depth: one of 18/34/50/101/152.
        edits: Optional per-layer activation rewrite applied mid-forward —
            the functional equivalent of ``nethook.edit_layer`` (reference:
            src/deps/netdissect/nethook.py:117-136); downstream compute and
            the recorded tap both see the edited value.
    """
    block_kind, stages = CONFIGS[depth]
    block = _basic_block if block_kind == "basic" else _bottleneck_block
    edits = edits or {}

    def tap(name: str, value: Array) -> Array:
        if name in edits:
            value = edits[name](value)
        acts[name] = value
        return value

    acts: Dict[str, Array] = {}
    h = nn.conv2d(x, params["conv1.weight"], stride=2, padding=3)
    h = tap("conv1", h)
    h = nn.batch_norm(h, *_bn_params(params, "bn1"))
    h = nn.relu(h)
    h = nn.max_pool2d(h, 3, 2, padding=1)

    for stage, blocks in enumerate(stages):
        for b in range(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            h = block(params, f"layer{stage + 1}.{b}", h, stride)
        h = tap(f"layer{stage + 1}", h)

    pooled = h.mean(axis=(2, 3))
    logits = nn.linear(pooled, params["fc.weight"], params["fc.bias"])
    return logits, acts


def init(key: PRNGKey, depth: int = 18, num_classes: int = 1000) -> Params:
    """Random-init parameters with the same names/shapes as torch."""
    block_kind, stages = CONFIGS[depth]
    expansion = 1 if block_kind == "basic" else 4
    params: Params = {}
    keys = iter(jax.random.split(key, 4096))

    def conv(name: str, o: int, i: int, k: int) -> None:
        fan_in = i * k * k
        std = (2.0 / fan_in) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o, i, k, k)) * std)

    def bn(name: str, c: int) -> None:
        params[f"{name}.weight"] = jnp.ones((c,))
        params[f"{name}.bias"] = jnp.zeros((c,))
        params[f"{name}.running_mean"] = jnp.zeros((c,))
        params[f"{name}.running_var"] = jnp.ones((c,))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)

    in_ch = 64
    for stage, blocks in enumerate(stages):
        width = _STAGE_WIDTHS[stage]
        out_ch = width * expansion
        for b in range(blocks):
            prefix = f"layer{stage + 1}.{b}"
            stride = 2 if (stage > 0 and b == 0) else 1
            if block_kind == "basic":
                conv(f"{prefix}.conv1", width, in_ch, 3)
                bn(f"{prefix}.bn1", width)
                conv(f"{prefix}.conv2", width, width, 3)
                bn(f"{prefix}.bn2", width)
            else:
                conv(f"{prefix}.conv1", width, in_ch, 1)
                bn(f"{prefix}.bn1", width)
                conv(f"{prefix}.conv2", width, width, 3)
                bn(f"{prefix}.bn2", width)
                conv(f"{prefix}.conv3", out_ch, width, 1)
                bn(f"{prefix}.bn3", out_ch)
            if stride != 1 or in_ch != out_ch:
                conv(f"{prefix}.downsample.0", out_ch, in_ch, 1)
                bn(f"{prefix}.downsample.1", out_ch)
            in_ch = out_ch

    std = (1.0 / in_ch) ** 0.5
    params["fc.weight"] = jax.random.normal(
        next(keys), (num_classes, in_ch)) * std
    params["fc.bias"] = jnp.zeros((num_classes,))
    return params
