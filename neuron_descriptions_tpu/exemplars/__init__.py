"""Exemplar computation: per-unit top-activating images and masks.

Public interface mirrors the reference (reference:
src/exemplars/__init__.py:14-15).
"""
from neuron_descriptions_tpu.exemplars import (compute, datasets, models,
                                               transforms)
from neuron_descriptions_tpu.exemplars.compute import (discriminative,
                                                       generative)

__all__ = [
    "compute",
    "datasets",
    "models",
    "transforms",
    "discriminative",
    "generative",
]
