"""Shared type aliases (reference: src/utils/typing.py)."""
import pathlib
from typing import Any, Mapping, Sequence, Tuple, Union

import jax
import numpy as np

Layer = Union[int, str]
Unit = Tuple[Layer, int]

PathLike = Union[str, pathlib.Path]

StrSequence = Sequence[str]
StrIterable = Any  # any iterable of strings
StrMapping = Mapping[str, str]

Array = jax.Array
ArrayLike = Union[jax.Array, np.ndarray]
ArrayPair = Tuple[Array, Array]
PyTree = Any
PRNGKey = jax.Array

Device = Any
