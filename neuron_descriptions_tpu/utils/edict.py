"""A tiny attribute-access dict, standing in for the easydict dependency.

The reference uses ``easydict.EasyDict`` for its KEYS namespaces
(reference: src/milannotations/loaders.py:11). We only need plain
attribute get/set over string keys.
"""
from typing import Any


class EasyDict(dict):
    """Dictionary with attribute access."""

    def __init__(self, d: Any = None, **kwargs: Any):
        super().__init__()
        if d:
            for key, value in dict(d).items():
                self[key] = value
        for key, value in kwargs.items():
            self[key] = value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as error:
            raise AttributeError(name) from error
