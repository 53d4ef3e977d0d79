"""Dataset configs for computing exemplars.

Rebuild of the reference registry (reference: src/exemplars/datasets.py):
imagenet/places365 as image folders with Resize(256) → CenterCrop(224) →
imagenet normalization; spurious-imagenet variants with square Resize(224);
BigGAN (z, y) representation datasets stored as tensor files.
"""
import pathlib
from typing import Any, Mapping, Optional

import numpy as np

from neuron_descriptions_tpu.data import images as data_images
from neuron_descriptions_tpu.milannotations import loaders as milannotations
from neuron_descriptions_tpu.utils import hubs
from neuron_descriptions_tpu.utils.edict import EasyDict
from neuron_descriptions_tpu.utils.typing import PathLike

__all__ = ["KEYS", "TensorDatasetOnDisk", "default_dataset_configs",
           "default_dataset_hub", "load"]

HOST = f"{hubs.HOST}/data"

KEYS = EasyDict(d=dict(milannotations.KEYS))
KEYS.IMAGENET_SPURIOUS_TEXT = "imagenet-spurious-text"
KEYS.IMAGENET_SPURIOUS_COLOR = "imagenet-spurious-color"
KEYS.BIGGAN_ZS_IMAGENET = "biggan-zs-imagenet"
KEYS.BIGGAN_ZS_PLACES365 = "biggan-zs-places365"


class TensorDatasetOnDisk:
    """Aligned tensor-column dataset stored in a directory.

    Accepts both ``.npy`` columns (native format) and the reference's
    ``.pth`` pickles (converted through the torch import shim; reference:
    src/exemplars/datasets.py:33-52). Columns are ordered float-first to
    match the reference's (z, y) convention.
    """

    def __init__(self, root: PathLike):
        root = pathlib.Path(root)
        columns = []
        for child in sorted(root.iterdir()):
            if child.suffix == ".npy":
                columns.append(np.load(child, mmap_mode="r"))
            elif child.suffix == ".pth":
                from neuron_descriptions_tpu.models import torch_import
                tensors = torch_import.to_numpy_tree(
                    __import__("torch").load(str(child),
                                             map_location="cpu"))
                columns.append(np.asarray(tensors))
        if not columns:
            raise FileNotFoundError(f"no tensor files under {root}")
        lengths = {len(c) for c in columns}
        if len(lengths) != 1:
            raise ValueError(f"misaligned columns: {lengths}")
        self.columns = tuple(
            sorted(columns,
                   key=lambda c: not np.issubdtype(c.dtype, np.floating)))

    def __len__(self) -> int:
        return len(self.columns[0])

    def __getitem__(self, index: int):
        return tuple(np.asarray(c[index]) for c in self.columns)


def default_dataset_configs(
        **others: hubs.DatasetConfig) -> Mapping[str, hubs.DatasetConfig]:
    """Return the default dataset configs
    (reference: src/exemplars/datasets.py:55-102)."""
    configs = {
        KEYS.IMAGENET:
            hubs.DatasetConfig(data_images.ImageFolder,
                               resize=256, crop=224, normalize="imagenet"),
        KEYS.PLACES365:
            hubs.DatasetConfig(data_images.ImageFolder,
                               resize=256, crop=224, normalize="imagenet"),
        KEYS.IMAGENET_SPURIOUS_TEXT:
            hubs.DatasetConfig(data_images.SquareResizeImageFolder,
                               size=224, normalize="imagenet"),
        KEYS.IMAGENET_SPURIOUS_COLOR:
            hubs.DatasetConfig(data_images.SquareResizeImageFolder,
                               size=224, normalize="imagenet"),
        KEYS.BIGGAN_ZS_IMAGENET:
            hubs.DatasetConfig(TensorDatasetOnDisk,
                               url=f"{HOST}/{KEYS.BIGGAN_ZS_IMAGENET}.zip"),
        KEYS.BIGGAN_ZS_PLACES365:
            hubs.DatasetConfig(TensorDatasetOnDisk,
                               url=f"{HOST}/{KEYS.BIGGAN_ZS_PLACES365}.zip"),
    }
    configs.update(others)
    return configs


def default_dataset_hub(**others: hubs.DatasetConfig) -> hubs.DatasetHub:
    """Return configs for all datasets used in dissection."""
    return hubs.DatasetHub(**default_dataset_configs(**others))


def load(name: str,
         configs: Optional[Mapping[str, hubs.DatasetConfig]] = None,
         **kwargs: Any) -> Any:
    """Load the dataset by registry name."""
    configs = configs or {}
    hub = default_dataset_hub(**configs)
    return hub.load(name, **kwargs)
