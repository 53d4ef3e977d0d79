"""Input/hidden adapters for exemplar computation.

JAX port of the reference's transforms (reference:
src/exemplars/transforms.py). ``map_location`` has no analog — device
placement is handled by jit/sharding, not manual ``.to(device)`` calls.
"""
import math
from typing import Any, Tuple, TypeVar

from neuron_descriptions_tpu.utils.typing import Array

__all__ = ["first", "identity", "identities", "spatialize_vit_mlp"]

T = TypeVar("T")


def first(*inputs: Any) -> Tuple[Any, ...]:
    """Return the first argument as a singleton tuple
    (reference: transforms.py:37-39)."""
    return (inputs[0],)


def identity(inputs: T) -> T:
    """Return the inputs unchanged (reference: transforms.py:45-47)."""
    return inputs


def identities(*inputs: T) -> Tuple[T, ...]:
    """Return all inputs as a tuple (reference: transforms.py:50-52)."""
    return inputs


def spatialize_vit_mlp(hiddens: Array) -> Array:
    """Arrange ViT MLP activations like conv activations.

    Drops the CLS token and reshapes (batch, 1 + patches, units) →
    (batch, units, √patches, √patches) (reference: transforms.py:55-81;
    the CLS off-by-one errata is in README.md:199-201 — this port uses the
    corrected behavior of excluding the CLS token).
    """
    batch_size, n_patches, n_units = hiddens.shape
    hiddens = hiddens[:, 1:]
    n_patches -= 1
    size = math.isqrt(n_patches)
    if size * size != n_patches:
        raise ValueError(f"non-square patch count: {n_patches}")
    return hiddens.transpose(0, 2, 1).reshape(batch_size, n_units, size,
                                              size)
