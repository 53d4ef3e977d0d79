"""Torchvision ShuffleNetV2 x1.0 as a pure JAX function with taps.

Dissected by the reference's audit paths with taps at conv1 / stage2-4 /
conv5 (reference: src/exemplars/models.py LAYERS.SHUFFLENET_V2_X1_0).
Torch state-dict key parity (``conv1.0``, ``stageN.M.branchK.*``,
``conv5.0``, ``fc``).
"""
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import nn
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = ["LAYERS", "STAGE_REPEATS", "STAGE_CHANNELS", "apply", "init"]

Params = Dict[str, Array]

STAGE_REPEATS = (4, 8, 4)
STAGE_CHANNELS = (24, 116, 232, 464, 1024)  # x1.0 variant

LAYERS = ("conv1", "stage2", "stage3", "stage4", "conv5")


def _channel_shuffle(x: Array, groups: int = 2) -> Array:
    n, c, h, w = x.shape
    x = x.reshape(n, groups, c // groups, h, w)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(n, c, h, w)


def _bn(params: Params, prefix: str, x: Array) -> Array:
    return nn.batch_norm(x, params[f"{prefix}.weight"],
                         params[f"{prefix}.bias"],
                         params[f"{prefix}.running_mean"],
                         params[f"{prefix}.running_var"])


def _branch2(params: Params, prefix: str, x: Array, stride: int,
             channels: int) -> Array:
    """1x1-BN-ReLU -> dw3x3-BN -> 1x1-BN-ReLU (branch2 Sequential)."""
    h = nn.conv2d(x, params[f"{prefix}.0.weight"])
    h = nn.relu(_bn(params, f"{prefix}.1", h))
    h = nn.conv2d(h, params[f"{prefix}.3.weight"], stride=stride, padding=1,
                  groups=channels)
    h = _bn(params, f"{prefix}.4", h)
    h = nn.conv2d(h, params[f"{prefix}.5.weight"])
    return nn.relu(_bn(params, f"{prefix}.6", h))


def _unit(params: Params, prefix: str, x: Array, stride: int,
          branch_ch: int) -> Array:
    if stride == 1:
        x1, x2 = jnp.split(x, 2, axis=1)
        out = jnp.concatenate(
            [x1, _branch2(params, f"{prefix}.branch2", x2, 1, branch_ch)],
            axis=1)
    else:
        in_ch = x.shape[1]
        b1 = nn.conv2d(x, params[f"{prefix}.branch1.0.weight"], stride=2,
                       padding=1, groups=in_ch)
        b1 = _bn(params, f"{prefix}.branch1.1", b1)
        b1 = nn.conv2d(b1, params[f"{prefix}.branch1.2.weight"])
        b1 = nn.relu(_bn(params, f"{prefix}.branch1.3", b1))
        b2 = _branch2(params, f"{prefix}.branch2", x, 2, branch_ch)
        out = jnp.concatenate([b1, b2], axis=1)
    return _channel_shuffle(out)


def apply(params: Params, x: Array,
          edits: Optional[Mapping[str, Callable[[Array], Array]]] = None
          ) -> Tuple[Array, Dict[str, Array]]:
    """Run ShuffleNetV2, returning (logits, taps).

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

    h = nn.conv2d(x, params["conv1.0.weight"], stride=2, padding=1)
    h = nn.relu(_bn(params, "conv1.1", h))
    h = tap("conv1", h)  # hook on the conv1 Sequential -> post-BN-ReLU
    h = nn.max_pool2d(h, 3, 2, padding=1)

    for stage_index, repeats in enumerate(STAGE_REPEATS, start=2):
        out_ch = STAGE_CHANNELS[stage_index - 1]
        branch_ch = out_ch // 2
        for unit_index in range(repeats):
            stride = 2 if unit_index == 0 else 1
            h = _unit(params, f"stage{stage_index}.{unit_index}", h, stride,
                      branch_ch)
        h = tap(f"stage{stage_index}", h)

    h = nn.conv2d(h, params["conv5.0.weight"])
    h = nn.relu(_bn(params, "conv5.1", h))
    h = tap("conv5", h)
    pooled = h.mean(axis=(2, 3))
    logits = nn.linear(pooled, params["fc.weight"], params["fc.bias"])
    return logits, acts


def init(key: PRNGKey, num_classes: int = 1000) -> Params:
    """Random-init parameters with the torch names/shapes."""
    params: Params = {}
    keys = iter(jax.random.split(key, 1024))

    def conv(name: str, o: int, i: int, k: int) -> None:
        std = (2.0 / (i * k * k)) ** 0.5
        params[f"{name}.weight"] = (
            jax.random.normal(next(keys), (o, i, k, k)) * std)

    def bn(name: str, c: int) -> None:
        params[f"{name}.weight"] = jnp.ones((c,))
        params[f"{name}.bias"] = jnp.zeros((c,))
        params[f"{name}.running_mean"] = jnp.zeros((c,))
        params[f"{name}.running_var"] = jnp.ones((c,))

    conv("conv1.0", STAGE_CHANNELS[0], 3, 3)
    bn("conv1.1", STAGE_CHANNELS[0])

    in_ch = STAGE_CHANNELS[0]
    for stage_index, repeats in enumerate(STAGE_REPEATS, start=2):
        out_ch = STAGE_CHANNELS[stage_index - 1]
        branch_ch = out_ch // 2
        for unit_index in range(repeats):
            prefix = f"stage{stage_index}.{unit_index}"
            if unit_index == 0:
                # branch1: dw conv (per-channel kernels) + 1x1.
                params[f"{prefix}.branch1.0.weight"] = (
                    jax.random.normal(next(keys), (in_ch, 1, 3, 3)) * 0.1)
                bn(f"{prefix}.branch1.1", in_ch)
                conv(f"{prefix}.branch1.2", branch_ch, in_ch, 1)
                bn(f"{prefix}.branch1.3", branch_ch)
                b2_in = in_ch
            else:
                b2_in = branch_ch
            conv(f"{prefix}.branch2.0", branch_ch, b2_in, 1)
            bn(f"{prefix}.branch2.1", branch_ch)
            params[f"{prefix}.branch2.3.weight"] = (
                jax.random.normal(next(keys), (branch_ch, 1, 3, 3)) * 0.1)
            bn(f"{prefix}.branch2.4", branch_ch)
            conv(f"{prefix}.branch2.5", branch_ch, branch_ch, 1)
            bn(f"{prefix}.branch2.6", branch_ch)
        in_ch = out_ch

    conv("conv5.0", STAGE_CHANNELS[-1], in_ch, 1)
    bn("conv5.1", STAGE_CHANNELS[-1])
    std = (1.0 / STAGE_CHANNELS[-1]) ** 0.5
    params["fc.weight"] = jax.random.normal(
        next(keys), (num_classes, STAGE_CHANNELS[-1])) * std
    params["fc.bias"] = jnp.zeros((num_classes,))
    return params
