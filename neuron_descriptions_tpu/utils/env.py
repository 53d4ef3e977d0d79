"""Environment-variable configuration.

Mirrors the reference config contract (reference: src/utils/env.py:7-50):
the three directories are configured by ``MILAN_DATA_DIR``,
``MILAN_MODELS_DIR`` and ``MILAN_RESULTS_DIR`` and default to ``./data``,
``./models`` and ``./results`` relative to the current working directory.
"""
import os
import pathlib

ENV_DATA_DIR = "MILAN_DATA_DIR"
ENV_MODELS_DIR = "MILAN_MODELS_DIR"
ENV_RESULTS_DIR = "MILAN_RESULTS_DIR"

DEFAULT_DATA_DIR = "data"
DEFAULT_MODELS_DIR = "models"
DEFAULT_RESULTS_DIR = "results"


def maybe_set_dir(key: str, default: str) -> pathlib.Path:
    """Read a directory from the environment, falling back to a default."""
    value = os.environ.get(key)
    if value is not None:
        return pathlib.Path(value)
    return pathlib.Path(os.getcwd()) / default


def data_dir() -> pathlib.Path:
    """Return the directory where datasets are stored."""
    return maybe_set_dir(ENV_DATA_DIR, DEFAULT_DATA_DIR)


def models_dir() -> pathlib.Path:
    """Return the directory where model weights are stored."""
    return maybe_set_dir(ENV_MODELS_DIR, DEFAULT_MODELS_DIR)


def results_dir() -> pathlib.Path:
    """Return the directory where results are written."""
    return maybe_set_dir(ENV_RESULTS_DIR, DEFAULT_RESULTS_DIR)
