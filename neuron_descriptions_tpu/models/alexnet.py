"""AlexNet variants as pure JAX functions with conv-layer taps.

Two architectures, matching the reference:

- ``apply``/``init``: torchvision AlexNet (used for alexnet/imagenet,
  sequentialized in the reference as ``alexnet_seq`` with taps
  conv1..conv5 = features.{0,3,6,8,10} raw conv outputs, reference:
  src/deps/ext/torchvision/models.py:18-47,
  src/exemplars/models.py:163-176).
- ``apply_places365``/``init_places365``: Caffe-style AlexNet with grouped
  convolutions used for places365 weights (reference: src/deps/alexnet.py —
  note LRN is *off* by default there, and we match that).

Taps are the raw conv outputs (pre-ReLU), exactly what a torch forward hook
on the conv module sees.
"""
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import nn
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = [
    "LAYERS",
    "apply",
    "init",
    "apply_places365",
    "init_places365",
]

Params = Dict[str, Array]

LAYERS = ("conv1", "conv2", "conv3", "conv4", "conv5")

# torchvision AlexNet: (out, in, kernel, stride, padding), features index.
_TV_CONVS = (
    ("features.0", 64, 3, 11, 4, 2),
    ("features.3", 192, 64, 5, 1, 2),
    ("features.6", 384, 192, 3, 1, 1),
    ("features.8", 256, 384, 3, 1, 1),
    ("features.10", 256, 256, 3, 1, 1),
)

# Caffe/places365 AlexNet: (out, in, kernel, stride, padding, groups).
_CAFFE_CONVS = (
    ("conv1", 96, 3, 11, 4, 0, 1),
    ("conv2", 256, 96, 5, 1, 2, 2),
    ("conv3", 384, 256, 3, 1, 1, 1),
    ("conv4", 384, 384, 3, 1, 1, 2),
    ("conv5", 256, 384, 3, 1, 1, 2),
)


def apply(params: Params, x: Array,
          edits: Optional[Mapping[str, Callable[[Array], Array]]] = None
          ) -> Tuple[Array, Dict[str, Array]]:
    """Torchvision AlexNet forward returning (logits, taps).

    Taps are keyed both by seq names (conv1..conv5) and torchvision module
    paths (features.N) so either naming convention works downstream.
    ``edits`` rewrites a tap mid-forward (functional nethook.edit_layer).
    """
    acts: Dict[str, Array] = {}
    edits = edits or {}
    h = x
    for i, (name, *_spec) in enumerate(_TV_CONVS):
        _, _, _, stride, padding = _spec
        h = nn.conv2d(h, params[f"{name}.weight"], params[f"{name}.bias"],
                      stride=stride, padding=padding)
        for alias in (f"conv{i + 1}", name):
            if alias in edits:
                h = edits[alias](h)
        acts[f"conv{i + 1}"] = h
        acts[name] = h
        h = nn.relu(h)
        if i in (0, 1, 4):  # pools after conv1, conv2, conv5
            h = nn.max_pool2d(h, 3, 2)
    h = nn.adaptive_avg_pool2d(h, 6)
    h = h.reshape(h.shape[0], -1)
    h = nn.relu(nn.linear(h, params["classifier.1.weight"],
                          params["classifier.1.bias"]))
    h = nn.relu(nn.linear(h, params["classifier.4.weight"],
                          params["classifier.4.bias"]))
    logits = nn.linear(h, params["classifier.6.weight"],
                       params["classifier.6.bias"])
    return logits, acts


def init(key: PRNGKey, num_classes: int = 1000) -> Params:
    """Random-init torchvision-AlexNet-shaped parameters."""
    params: Params = {}
    keys = iter(jax.random.split(key, 32))

    for name, o, i, k, _, _ in _TV_CONVS:
        fan_in = i * k * k
        std = (2.0 / fan_in) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o, i, k, k)) * std)
        params[f"{name}.bias"] = jnp.zeros((o,))

    dims = ((256 * 6 * 6, 4096, "classifier.1"),
            (4096, 4096, "classifier.4"), (4096, num_classes, "classifier.6"))
    for i_dim, o_dim, name in dims:
        std = (1.0 / i_dim) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o_dim, i_dim)) * std)
        params[f"{name}.bias"] = jnp.zeros((o_dim,))
    return params


def apply_places365(params: Params, x: Array,
                    include_lrn: bool = False,
                    edits: Optional[Mapping[str,
                                            Callable[[Array],
                                                     Array]]] = None
                    ) -> Tuple[Array, Dict[str, Array]]:
    """Caffe-style places365 AlexNet forward returning (logits, taps).

    ``edits`` rewrites a tap mid-forward (functional nethook.edit_layer).
    """
    acts: Dict[str, Array] = {}
    edits = edits or {}
    h = x
    for i, (name, *_spec) in enumerate(_CAFFE_CONVS):
        _, _, _, stride, padding, groups = _spec
        h = nn.conv2d(h, params[f"{name}.weight"], params[f"{name}.bias"],
                      stride=stride, padding=padding, groups=groups)
        if name in edits:
            h = edits[name](h)
        acts[name] = h
        h = nn.relu(h)
        if i in (0, 1):
            h = nn.max_pool2d(h, 3, 2)
            if include_lrn:
                h = nn.local_response_norm(h, 5, alpha=1e-4, beta=0.75)
        elif i == 4:
            h = nn.max_pool2d(h, 3, 2)
    h = h.reshape(h.shape[0], -1)
    h = nn.relu(nn.linear(h, params["fc6.weight"], params["fc6.bias"]))
    h = nn.relu(nn.linear(h, params["fc7.weight"], params["fc7.bias"]))
    logits = nn.linear(h, params["fc8.weight"], params["fc8.bias"])
    return logits, acts


def init_places365(key: PRNGKey, num_classes: int = 365) -> Params:
    """Random-init Caffe-AlexNet-shaped parameters."""
    params: Params = {}
    keys = iter(jax.random.split(key, 32))

    for name, o, i, k, _, _, groups in _CAFFE_CONVS:
        fan_in = (i // groups) * k * k
        std = (2.0 / fan_in) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o, i // groups, k, k)) * std)
        params[f"{name}.bias"] = jnp.zeros((o,))

    dims = ((256 * 6 * 6, 4096, "fc6"), (4096, 4096, "fc7"),
            (4096, num_classes, "fc8"))
    for i_dim, o_dim, name in dims:
        std = (1.0 / i_dim) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o_dim, i_dim)) * std)
        params[f"{name}.bias"] = jnp.zeros((o_dim,))
    return params
