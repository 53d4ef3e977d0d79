"""Image normalization conversions between the standard color spaces.

Port of NetDissect's renormalize contract (reference:
src/deps/netdissect/renormalize.py:53-139): named normalization spaces and
a ``Renormalizer`` that converts between them with a fused multiply-add.
Works on numpy or JAX arrays of shape (..., 3, H, W).
"""
from typing import Tuple, Union

import numpy as np

from neuron_descriptions_tpu.utils.typing import ArrayLike

__all__ = ["OFFSET_SCALE", "Renormalizer", "renormalizer"]

# The commonly-seen image normalization schemes
# (reference: renormalize.py:84-92).
OFFSET_SCALE = dict(
    pt=([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    zc=([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    imagenet=([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    imagenet_meanonly=([0.485, 0.456, 0.406],
                       [1.0 / 255, 1.0 / 255, 1.0 / 255]),
    places_meanonly=([0.475, 0.441, 0.408],
                     [1.0 / 255, 1.0 / 255, 1.0 / 255]),
    byte=([0.0, 0.0, 0.0], [1.0 / 255, 1.0 / 255, 1.0 / 255]),
)

Space = Union[str, Tuple]


class Renormalizer:
    """Converts image tensors from one normalization space to another.

    ``y = x * mul + add`` with per-channel constants, clamped to [0, 255]
    uint8 when the target is 'byte' (reference: renormalize.py:118-139).
    """

    def __init__(self, source: Space = "zc", target: Space = "zc"):
        old_offset, old_scale = (OFFSET_SCALE[source]
                                 if isinstance(source, str) else source)
        new_offset, new_scale = (OFFSET_SCALE[target]
                                 if isinstance(target, str) else target)
        self.mul = (np.asarray(old_scale) /
                    np.asarray(new_scale)).astype(np.float32)
        self.add = ((np.asarray(old_offset) - np.asarray(new_offset)) /
                    np.asarray(new_scale)).astype(np.float32)
        self.tobyte = target == "byte"
        self.mean = new_offset
        self.std = new_scale

    def __call__(self, data: ArrayLike) -> ArrayLike:
        mul = self.mul.reshape((3, 1, 1))
        add = self.add.reshape((3, 1, 1))
        result = data * mul + add
        if self.tobyte:
            result = result.clip(0, 255)
            if isinstance(result, np.ndarray):
                result = result.astype(np.uint8)
            else:
                result = result.astype("uint8")
        return result


def renormalizer(source: Space = "zc", target: Space = "zc") -> Renormalizer:
    """Factory matching the reference's call signature."""
    return Renormalizer(source=source, target=target)
