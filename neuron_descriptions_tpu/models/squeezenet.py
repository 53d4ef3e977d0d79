"""Torchvision SqueezeNet 1.0 as a pure JAX function with taps.

Dissected by the reference's audit paths with taps at the stem conv and
every Fire module (reference: src/exemplars/models.py
LAYERS.SQUEEZENET1_0 = ``features.{0,3,4,5,7,8,9,10,12}``). Torch
state-dict key parity (``features.N.squeeze/expand1x1/expand3x3``,
``classifier.1``).
"""
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import nn
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["LAYERS", "FIRES", "apply", "init"]

Params = Dict[str, Array]

# features index -> (squeeze, expand1x1, expand3x3) for SqueezeNet 1.0.
FIRES = {
    3: (16, 64, 64),
    4: (16, 64, 64),
    5: (32, 128, 128),
    7: (32, 128, 128),
    8: (48, 192, 192),
    9: (48, 192, 192),
    10: (64, 256, 256),
    12: (64, 256, 256),
}
POOLS = (2, 6, 11)  # maxpool positions in the features Sequential

LAYERS = tuple(f"features.{i}" for i in (0, 3, 4, 5, 7, 8, 9, 10, 12))


def _fire(params: Params, prefix: str, x: Array) -> Array:
    squeeze = nn.relu(nn.conv2d(x, params[f"{prefix}.squeeze.weight"],
                                params[f"{prefix}.squeeze.bias"]))
    e1 = nn.relu(nn.conv2d(squeeze, params[f"{prefix}.expand1x1.weight"],
                           params[f"{prefix}.expand1x1.bias"]))
    e3 = nn.relu(nn.conv2d(squeeze, params[f"{prefix}.expand3x3.weight"],
                           params[f"{prefix}.expand3x3.bias"], padding=1))
    return jnp.concatenate([e1, e3], axis=1)


def apply(params: Params, x: Array,
          edits: Optional[Mapping[str, Callable[[Array], Array]]] = None
          ) -> Tuple[Array, Dict[str, Array]]:
    """Run SqueezeNet 1.0, returning (logits, taps).

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

    h = nn.conv2d(x, params["features.0.weight"], params["features.0.bias"],
                  stride=2)
    h = tap("features.0", h)  # conv output pre-ReLU (hook on conv module)
    h = nn.relu(h)
    for index in range(2, 13):
        if index in POOLS:
            h = nn.max_pool2d(h, 3, 2)
        elif index in FIRES:
            h = _fire(params, f"features.{index}", h)
            h = tap(f"features.{index}", h)
    h = nn.conv2d(h, params["classifier.1.weight"],
                  params["classifier.1.bias"])
    h = nn.relu(h)
    logits = nn.adaptive_avg_pool2d(h, 1)[:, :, 0, 0]
    return logits, acts


def init(key: PRNGKey, num_classes: int = 1000) -> Params:
    """Random-init parameters with the torch names/shapes."""
    params: Params = {}
    keys = iter(jax.random.split(key, 256))

    def conv(name: str, o: int, i: int, k: int) -> None:
        std = (2.0 / (i * k * k)) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o, i, k, k)) * std)
        params[f"{name}.bias"] = jnp.zeros((o,))

    conv("features.0", 96, 3, 7)
    in_ch = 96
    for index, (squeeze, e1, e3) in FIRES.items():
        prefix = f"features.{index}"
        conv(f"{prefix}.squeeze", squeeze, in_ch, 1)
        conv(f"{prefix}.expand1x1", e1, squeeze, 1)
        conv(f"{prefix}.expand3x3", e3, squeeze, 3)
        in_ch = e1 + e3
    conv("classifier.1", num_classes, in_ch, 1)
    return params
