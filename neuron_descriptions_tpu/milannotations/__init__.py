"""MILANNOTATIONS: datasets of per-unit exemplars and human descriptions.

Public interface mirrors the reference (reference:
src/milannotations/__init__.py:3-7).
"""
from neuron_descriptions_tpu.milannotations.datasets import (
    AnnotatedTopImages, AnnotatedTopImagesDataset, AnyTopImages,
    AnyTopImagesDataset, TopImages, TopImagesDataset)
from neuron_descriptions_tpu.milannotations.loaders import (
    DATASET_GROUPINGS, KEYS, load)

__all__ = [
    "AnnotatedTopImages",
    "AnnotatedTopImagesDataset",
    "AnyTopImages",
    "AnyTopImagesDataset",
    "TopImages",
    "TopImagesDataset",
    "DATASET_GROUPINGS",
    "KEYS",
    "load",
]
