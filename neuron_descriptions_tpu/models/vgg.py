"""Torchvision-architecture VGG nets as pure JAX functions with taps.

The reference dissects vgg11/13/16/19 (imagenet + blurred) and a places365
vgg16 with rekeyed Caffe weights (reference: src/exemplars/models.py:56-59,
183-188, 349-400). Taps are keyed by torchvision module path
(``features.N``) — the raw conv output (pre-ReLU), matching a torch hook on
the conv module. The reference's per-arch tap lists live in the exemplars
registry (``LAYERS`` here mirrors src/exemplars/models.py:56-59).
"""
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import nn
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["CONFIGS", "LAYERS", "apply", "init"]

Params = Dict[str, Array]

# Stage channel plans; "M" = maxpool.
CONFIGS = {
    11: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    13: (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512,
         "M"),
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
         512, 512, 512, "M"),
    19: (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512,
         512, "M", 512, 512, 512, 512, "M"),
}

# Default dissection taps per depth (reference: src/exemplars/models.py:56-59).
LAYERS = {
    11: tuple(f"features.{i}" for i in (0, 3, 8, 13, 18)),
    13: tuple(f"features.{i}" for i in (2, 7, 12, 17, 22)),
    16: tuple(f"features.{i}" for i in (2, 7, 14, 21, 28)),
    19: tuple(f"features.{i}" for i in (2, 7, 16, 25, 34)),
}


def _conv_indices(depth: int):
    """Yield (features_index, out_channels, in_channels)."""
    idx, in_ch = 0, 3
    for entry in CONFIGS[depth]:
        if entry == "M":
            idx += 1
        else:
            yield idx, entry, in_ch
            in_ch = entry
            idx += 2  # conv + relu


def apply(params: Params, x: Array, depth: int = 16,
          edits: Optional[Mapping[str, Callable[[Array], Array]]] = None
          ) -> Tuple[Array, Dict[str, Array]]:
    """Run the VGG, returning (logits, {features.N: conv activations}).

    ``edits`` rewrites a tap mid-forward (the functional nethook.edit_layer,
    reference: src/deps/netdissect/nethook.py:117-136).
    """
    acts: Dict[str, Array] = {}
    edits = edits or {}
    h = x
    idx = 0
    for entry in CONFIGS[depth]:
        if entry == "M":
            h = nn.max_pool2d(h, 2, 2)
            idx += 1
        else:
            name = f"features.{idx}"
            h = nn.conv2d(h, params[f"{name}.weight"], params[f"{name}.bias"],
                          padding=1)
            if name in edits:
                h = edits[name](h)
            acts[name] = h
            h = nn.relu(h)
            idx += 2
    h = nn.adaptive_avg_pool2d(h, 7)
    h = h.reshape(h.shape[0], -1)
    h = nn.relu(nn.linear(h, params["classifier.0.weight"],
                          params["classifier.0.bias"]))
    h = nn.relu(nn.linear(h, params["classifier.3.weight"],
                          params["classifier.3.bias"]))
    logits = nn.linear(h, params["classifier.6.weight"],
                       params["classifier.6.bias"])
    return logits, acts


def init(key: PRNGKey, depth: int = 16, num_classes: int = 1000) -> Params:
    """Random-init torch-shaped VGG parameters."""
    params: Params = {}
    keys = iter(jax.random.split(key, 64))

    for idx, out_ch, in_ch in _conv_indices(depth):
        fan_in = in_ch * 9
        std = (2.0 / fan_in) ** 0.5
        params[f"features.{idx}.weight"] = (
            jax.random.normal(next(keys), (out_ch, in_ch, 3, 3)) * std)
        params[f"features.{idx}.bias"] = jnp.zeros((out_ch,))

    dims = ((512 * 7 * 7, 4096, "classifier.0"),
            (4096, 4096, "classifier.3"),
            (4096, num_classes, "classifier.6"))
    for i_dim, o_dim, name in dims:
        std = (1.0 / i_dim) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o_dim, i_dim)) * std)
        params[f"{name}.bias"] = jnp.zeros((o_dim,))
    return params
