"""Import torch ``.pth`` checkpoints into JAX parameter dicts.

The reference distributes every pretrained artifact as torch ``.pth`` files
(subject-model weights downloaded per ModelConfig, reference:
src/utils/hubs.py:69-130; MILAN checkpoints as Serializable payloads,
reference: src/utils/serialize.py:175-269, src/milan/loaders.py:9-25).
This module converts those files into flat numpy/JAX dicts.

Two paths:
- ``load_state_dict``: uses torch (CPU build, available as a tools-only
  dependency in this image) with ``map_location='cpu'``. This path handles
  every pickle the reference can produce, including legacy serialization.
- torch is imported lazily so the core framework never depends on it at
  runtime; TPU-side code only ever sees numpy/jnp arrays.
"""
import pathlib
import pickle
import types
from typing import Any, Dict, Mapping, Optional

import numpy as np

from neuron_descriptions_tpu.utils.typing import PathLike

__all__ = ["load_state_dict", "load_payload", "to_numpy_tree"]


class _Stub:
    """Placeholder for classes from packages absent in this environment.

    The published MILAN payloads embed pickled spaCy objects — a
    ``(config, bytes)`` tuple whose config is a thinc ``Config`` instance
    (reference: src/utils/serialize.py:104-107). Deserializing a Decoder
    never needs those objects (``lang.Tokenizer`` discards the ``nlp``
    field and rebuilds its rule tokenizer from the boolean flags), so
    unpickling substitutes inert stubs rather than failing on the missing
    import.
    """

    def __init__(self, *args: Any, **kwargs: Any):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state: Any) -> None:
        self._state = state

    def __call__(self, *args: Any, **kwargs: Any) -> "_Stub":
        return _Stub(*args, **kwargs)


class _TolerantUnpickler(pickle.Unpickler):

    def find_class(self, module: str, name: str) -> Any:
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            stub = type(name, (_Stub,), {"__module__": module})
            return stub


def _tolerant_pickle_module() -> types.SimpleNamespace:
    """A pickle-module shim for ``torch.load(pickle_module=...)``."""
    return types.SimpleNamespace(
        Unpickler=_TolerantUnpickler,
        load=lambda f, **kw: _TolerantUnpickler(f, **kw).load(),
        loads=pickle.loads,
        __name__="tolerant_pickle",
    )


def _torch():
    try:
        import torch  # noqa: PLC0415
    except ImportError as error:  # pragma: no cover
        raise ImportError(
            "loading .pth checkpoints requires the (CPU) torch tool "
            "dependency; install torch or convert the checkpoint offline"
        ) from error
    return torch


def to_numpy_tree(obj: Any) -> Any:
    """Recursively convert torch tensors in a container to numpy arrays."""
    torch = _torch()
    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, Mapping):
        return {key: to_numpy_tree(value) for key, value in obj.items()}
    if isinstance(obj, (list, tuple)):
        converted = [to_numpy_tree(value) for value in obj]
        return type(obj)(converted) if isinstance(obj, tuple) else converted
    return obj


def load_payload(path: PathLike) -> Any:
    """torch.load a ``.pth`` file, tolerating classes from absent packages.

    Tries the default unpickler first (faithful objects when the packages
    exist) and falls back to stubbing unknown classes — which is what the
    published MILAN payloads need here, since they embed spaCy pipeline
    objects and spaCy is not a dependency of this framework.
    """
    torch = _torch()
    path = pathlib.Path(path)
    try:
        return torch.load(str(path), map_location="cpu", weights_only=False)
    except (ImportError, ModuleNotFoundError, AttributeError):
        return torch.load(str(path), map_location="cpu", weights_only=False,
                          pickle_module=_tolerant_pickle_module())
    except Exception:
        # Not a torch container at all — the native save format is a plain
        # pickle of numpy-only dicts (utils.serialize.save_payload).
        with path.open("rb") as handle:
            try:
                return pickle.load(handle)
            except Exception:
                handle.seek(0)
                return _TolerantUnpickler(handle).load()


def load_state_dict(path: PathLike,
                    transform: Optional[Any] = None
                    ) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` state dict as a flat name → numpy array mapping.

    Args:
        path: The checkpoint file.
        transform: Optional callable applied to the raw loaded object before
            conversion — the rebuild's analog of the reference's
            ``transform_weights`` hook (e.g. ``lambda w: w['state_dict']``
            for places365 checkpoints, reference:
            src/exemplars/models.py:180-182).
    """
    path = pathlib.Path(path)
    payload = load_payload(path)
    if transform is not None:
        payload = transform(payload)
    if not isinstance(payload, Mapping):
        raise ValueError(
            f"expected a state-dict mapping in {path}, got "
            f"{type(payload).__name__}")
    torch = _torch()
    state = {}
    for key, value in payload.items():
        if isinstance(value, torch.Tensor):
            state[key] = value.detach().cpu().numpy()
        elif isinstance(value, np.ndarray):
            state[key] = value
    return state
