"""Torchvision-architecture DenseNets as pure JAX functions with taps.

The reference dissects densenet121/201 (imagenet + blurred) via torchvision
(reference: src/exemplars/models.py:234-257 with taps at ``features.conv0``
and ``features.denseblock1..4`` — src/exemplars/models.py LAYERS). Taps:
``features.conv0`` is the stem conv output (pre-BN, matching a torch hook
on the conv module); ``features.denseblockN`` is the block's concatenated
feature map (pre-transition).

Parameters are keyed exactly like torch ``state_dict()`` so pretrained
import is mechanical.
"""
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import nn
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["CONFIGS", "LAYERS", "apply", "init"]

Params = Dict[str, Array]

# depth -> layers per dense block (torchvision configs).
CONFIGS = {
    121: (6, 12, 24, 16),
    201: (6, 12, 48, 32),
}

GROWTH = 32
INIT_CH = 64
BN_SIZE = 4

LAYERS = ("features.conv0", "features.denseblock1", "features.denseblock2",
          "features.denseblock3", "features.denseblock4")


def _bn_relu(params: Params, prefix: str, x: Array) -> Array:
    x = nn.batch_norm(x, params[f"{prefix}.weight"], params[f"{prefix}.bias"],
                      params[f"{prefix}.running_mean"],
                      params[f"{prefix}.running_var"])
    return nn.relu(x)


def _dense_layer(params: Params, prefix: str, x: Array) -> Array:
    """One dense layer: BN-ReLU-1x1 -> BN-ReLU-3x3, returns new features."""
    h = _bn_relu(params, f"{prefix}.norm1", x)
    h = nn.conv2d(h, params[f"{prefix}.conv1.weight"])
    h = _bn_relu(params, f"{prefix}.norm2", h)
    return nn.conv2d(h, params[f"{prefix}.conv2.weight"], padding=1)


def _transition(params: Params, prefix: str, x: Array) -> Array:
    h = _bn_relu(params, f"{prefix}.norm", x)
    h = nn.conv2d(h, params[f"{prefix}.conv.weight"])
    return nn.avg_pool2d(h, 2, 2)


def apply(params: Params, x: Array, depth: int = 121,
          edits: Optional[Mapping[str, Callable[[Array], Array]]] = None
          ) -> Tuple[Array, Dict[str, Array]]:
    """Run the DenseNet, returning (logits, taps).

    ``edits`` rewrites a tap mid-forward (functional
    nethook.edit_layer, reference: src/deps/netdissect/nethook.py:117-136).
    """
    blocks = CONFIGS[depth]
    acts: Dict[str, Array] = {}
    edits = edits or {}

    def tap(name: str, value: Array) -> Array:
        if name in edits:
            value = edits[name](value)
        acts[name] = value
        return value

    h = nn.conv2d(x, params["features.conv0.weight"], stride=2, padding=3)
    h = tap("features.conv0", h)
    h = _bn_relu(params, "features.norm0", h)
    h = nn.max_pool2d(h, 3, 2, padding=1)

    for block_index, n_layers in enumerate(blocks, start=1):
        block = f"features.denseblock{block_index}"
        for layer_index in range(1, n_layers + 1):
            new = _dense_layer(params, f"{block}.denselayer{layer_index}", h)
            h = jnp.concatenate([h, new], axis=1)
        h = tap(block, h)
        if block_index < len(blocks):
            h = _transition(params, f"features.transition{block_index}", h)

    h = _bn_relu(params, "features.norm5", h)
    pooled = h.mean(axis=(2, 3))
    logits = nn.linear(pooled, params["classifier.weight"],
                       params["classifier.bias"])
    return logits, acts


def init(key: PRNGKey, depth: int = 121, num_classes: int = 1000) -> Params:
    """Random-init parameters with the torch names/shapes."""
    blocks = CONFIGS[depth]
    params: Params = {}
    keys = iter(jax.random.split(key, 2048))

    def conv(name: str, o: int, i: int, k: int) -> None:
        std = (2.0 / (i * k * k)) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o, i, k, k)) * std)

    def norm(name: str, c: int) -> None:
        params[f"{name}.weight"] = jnp.ones((c,))
        params[f"{name}.bias"] = jnp.zeros((c,))
        params[f"{name}.running_mean"] = jnp.zeros((c,))
        params[f"{name}.running_var"] = jnp.ones((c,))

    conv("features.conv0", INIT_CH, 3, 7)
    norm("features.norm0", INIT_CH)

    channels = INIT_CH
    for block_index, n_layers in enumerate(blocks, start=1):
        block = f"features.denseblock{block_index}"
        for layer_index in range(1, n_layers + 1):
            prefix = f"{block}.denselayer{layer_index}"
            norm(f"{prefix}.norm1", channels)
            conv(f"{prefix}.conv1", BN_SIZE * GROWTH, channels, 1)
            norm(f"{prefix}.norm2", BN_SIZE * GROWTH)
            conv(f"{prefix}.conv2", GROWTH, BN_SIZE * GROWTH, 3)
            channels += GROWTH
        if block_index < len(blocks):
            prefix = f"features.transition{block_index}"
            norm(f"{prefix}.norm", channels)
            conv(f"{prefix}.conv", channels // 2, channels, 1)
            channels //= 2

    norm("features.norm5", channels)
    std = (1.0 / channels) ** 0.5
    params["classifier.weight"] = (
        jax.random.normal(next(keys), (num_classes, channels)) * std)
    params["classifier.bias"] = jnp.zeros((num_classes,))
    return params
