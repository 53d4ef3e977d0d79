"""Host-side data layer: image decoding, normalization, batch loading.

The CPU half of the exemplar pipeline (reference equivalents:
torchvision ImageFolder + transforms, torch DataLoader workers, and
NetDissect's renormalize module).
"""
from neuron_descriptions_tpu.data import images, loader, renormalize
from neuron_descriptions_tpu.data.images import (ImageFolder,
                                                 TensorDatasetOnDisk)
from neuron_descriptions_tpu.data.loader import Loader, batches

__all__ = [
    "images",
    "loader",
    "renormalize",
    "ImageFolder",
    "TensorDatasetOnDisk",
    "Loader",
    "batches",
]
