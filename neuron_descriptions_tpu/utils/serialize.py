"""Codebase-independent model payloads (reference: src/utils/serialize.py).

The reference distributes every pretrained MILAN model as a ``.pth`` file
holding a nested ``{properties, children, state_dict}`` dictionary
(reference: src/utils/serialize.py:80-118,188-204). ``properties`` are
constructor kwargs (recursively serialized when themselves serializable),
``children`` maps property names to type keys resolved by ``resolve()``,
and ``state_dict`` is a flat name→tensor mapping.

This module re-implements that contract for the functional JAX stack:

- ``Serializable`` — the same mixin protocol; payloads produced here are
  structurally identical to the reference's (so the two ecosystems can read
  each other's payloads, modulo tensor type).
- ``SerializableParams`` — the analog of ``SerializableModule``
  (reference: serialize.py:175-269) for objects whose learnable state is a
  flat, torch-keyed parameter dict (the convention used by every model in
  this package). Instead of ``load_state_dict`` mutation, the params dict is
  passed to the constructor as ``state_dict=``.
- ``save``/``load`` — native files are plain pickles of numpy-only payloads
  (the same "it's just dictionaries" portability argument as the reference);
  ``load`` additionally auto-detects torch zipfile checkpoints and converts
  tensors to numpy via ``models.torch_import``, which is how the published
  ``milan-*.pth`` files are ingested (reference: src/milan/loaders.py:17-24).

Special-cased values (reference: serialize.py:98-118,140-153): the reference
embeds spaCy pipelines as ``(config, bytes)`` tuples inside properties. We
keep them intact on load and hand them to whatever constructor receives them
(``lang.Tokenizer`` accepts and discards them, reconstructing its rule
tokenizer from the boolean flags alone).
"""
import pathlib
import pickle
from typing import Any, Dict, Mapping, Type, TypeVar

import numpy as np

from neuron_descriptions_tpu.utils.typing import PathLike

__all__ = [
    "Properties",
    "Serialized",
    "Children",
    "Resolved",
    "Serializable",
    "SerializableParams",
    "load_payload",
    "save_payload",
]

Properties = Mapping[str, Any]
Serialized = Mapping[str, Any]
Children = Mapping[str, Any]
Resolved = Mapping[str, Type["Serializable"]]

SerializableT = TypeVar("SerializableT", bound="Serializable")


class Serializable:
    """Mixin mapping objects to plain-dict payloads and back.

    Same protocol as the reference (reference: serialize.py:19-168):
    subclasses override ``properties()`` to return constructor kwargs,
    ``serializable()`` to name child fields whose concrete type varies,
    and ``resolve()`` to map child type-keys back to classes.
    """

    def properties(self) -> Properties:
        """Return constructor kwargs needed to rebuild this object."""
        return dict(vars(self))

    def serializable(self) -> Children:
        """Return type keys for children whose type must be recorded."""
        return {}

    def serialize(self, **kwargs: Any) -> Dict[str, Any]:
        """Serialize to a ``{properties, children}`` payload."""
        properties = dict(self.properties())
        children = dict(self.serializable())
        for key, value in properties.items():
            if key in children and not isinstance(value, Serializable):
                raise ValueError(f'child "{key}" is not serializable '
                                 f"type: {type(value).__name__}")
            if isinstance(value, Serializable):
                properties[key] = value.serialize(**kwargs)
        return {"properties": properties, "children": children}

    @classmethod
    def resolve(cls, children: Children) -> Resolved:
        """Resolve Serializable types for all children."""
        return {}

    @classmethod
    def deserialize(cls: Type[SerializableT], serialized: Mapping[str, Any],
                    **kwargs: Any) -> SerializableT:
        """Rebuild the object from its payload."""
        properties = dict(serialized["properties"])
        children = dict(serialized.get("children") or {})
        resolved = cls.resolve(children)
        for key, serializable_type in resolved.items():
            if key in properties and properties[key] is not None:
                properties[key] = serializable_type.deserialize(
                    properties[key], **kwargs)
        return cls(**properties)


class SerializableParams(Serializable):
    """A serializable object with a flat params dict as learnable state.

    The analog of the reference's ``SerializableModule``
    (reference: serialize.py:175-269). Subclasses must accept a
    ``state_dict=`` kwarg in their constructor (a flat name → numpy/jax
    array mapping using torch ``state_dict()`` key names) and expose their
    current parameters via ``state_dict()``.
    """

    def state_dict(self) -> Dict[str, np.ndarray]:
        """Return the flat parameter mapping."""
        raise NotImplementedError

    def serialize(self, state_dict: bool = True,
                  **kwargs: Any) -> Dict[str, Any]:
        """Serialize, optionally including parameters."""
        serialized = dict(super().serialize(state_dict=False, **kwargs))
        if state_dict:
            serialized["state_dict"] = {
                key: np.asarray(value)
                for key, value in self.state_dict().items()
            }
        return serialized

    @classmethod
    def deserialize(cls: Type[SerializableT], serialized: Mapping[str, Any],
                    load_state_dict: bool = True,
                    **kwargs: Any) -> SerializableT:
        """Rebuild the object, handing it the saved parameters."""
        serialized = dict(serialized)
        state_dict = serialized.pop("state_dict", None)
        properties = dict(serialized["properties"])
        children = dict(serialized.get("children") or {})
        resolved = cls.resolve(children)
        for key, serializable_type in resolved.items():
            if key in properties and properties[key] is not None:
                properties[key] = serializable_type.deserialize(
                    properties[key], **kwargs)
        if state_dict is not None and load_state_dict:
            properties["state_dict"] = state_dict
        return cls(**properties)

    def save(self, file: PathLike, **kwargs: Any) -> None:
        """Serialize and write to a file."""
        save_payload(self.serialize(**kwargs), file)

    @classmethod
    def load(cls: Type[SerializableT], file: PathLike,
             **kwargs: Any) -> SerializableT:
        """Load the object from a native or torch payload file."""
        payload = load_payload(file)
        return cls.deserialize(payload, **kwargs)


def save_payload(payload: Mapping[str, Any], file: PathLike) -> None:
    """Write a payload as a plain pickle of numpy-only containers."""
    file = pathlib.Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    with file.open("wb") as handle:
        pickle.dump(_to_plain(payload), handle)


def load_payload(file: PathLike) -> Dict[str, Any]:
    """Read a payload file written by us (pickle) or torch (zip).

    torch>=1.6 checkpoints are zipfiles (magic ``PK``); legacy torch and our
    native saves are plain pickles. Torch files are decoded through the
    tools-only torch dependency and converted to numpy
    (``models.torch_import.to_numpy_tree``).
    """
    file = pathlib.Path(file)
    with file.open("rb") as handle:
        magic = handle.read(2)
    if magic == b"PK":
        from neuron_descriptions_tpu.models import torch_import
        payload = torch_import.load_payload(file)
        return torch_import.to_numpy_tree(payload)
    with file.open("rb") as handle:
        try:
            return pickle.load(handle)
        except Exception:
            # Legacy (pre-zipfile) torch pickles need torch's unpickler.
            from neuron_descriptions_tpu.models import torch_import
            payload = torch_import.load_payload(file)
            return torch_import.to_numpy_tree(payload)


def _to_plain(obj: Any) -> Any:
    """Convert jax arrays (and other array-likes) to numpy recursively."""
    if isinstance(obj, Mapping):
        return {key: _to_plain(value) for key, value in obj.items()}
    if isinstance(obj, tuple):
        return tuple(_to_plain(value) for value in obj)
    if isinstance(obj, list):
        return [_to_plain(value) for value in obj]
    if hasattr(obj, "__array__") and not isinstance(obj, np.ndarray):
        return np.asarray(obj)
    return obj
