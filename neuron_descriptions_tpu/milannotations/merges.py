"""Merging distributable exemplar data with user-supplied source images.

Rebuild of the reference's merge layer (reference:
src/milannotations/merges.py). ImageNet cannot be redistributed, so
MILANNOTATIONS zips ship only ``ids.csv``/``masks.npy`` per layer; this
module reads the user's local ImageFolder copy and packs ``images.npy``.
"""
import csv
import pathlib
from typing import Any, Optional

import numpy as np

from neuron_descriptions_tpu.data import images as data_images
from neuron_descriptions_tpu.milannotations import datasets
from neuron_descriptions_tpu.utils import env
from neuron_descriptions_tpu.utils.typing import PathLike

__all__ = ["merge", "maybe_merge_and_load_dataset"]


def merge(root: PathLike,
          source: Any,
          force: bool = False,
          image_index: int = 0) -> None:
    """Pack source images referenced by each layer's ids.csv into images.npy.

    Source samples must yield float (3, H, W) arrays in [0, 1] at
    ``image_index`` (reference: merges.py:35-156).
    """
    root = pathlib.Path(root)
    source_length = len(source)
    layer_dirs = [path for path in root.iterdir() if path.is_dir()]

    for layer_dir in layer_dirs:
        layer = layer_dir.name
        images_file = layer_dir / "images.npy"
        if images_file.exists() and not force:
            continue

        ids_file = layer_dir / "ids.csv"
        if not ids_file.is_file():
            raise FileNotFoundError(f"layer {layer} missing ids.csv")

        with ids_file.open("r") as handle:
            ids_by_unit = tuple(csv.reader(handle))

        images_by_unit = []
        for unit, ids in enumerate(ids_by_unit):
            images = []
            for pos, idx_str in enumerate(ids):
                idx = int(idx_str)
                if idx < 0 or idx >= source_length:
                    raise IndexError(
                        f"while merging source image {pos} for unit {unit} "
                        f"in layer {layer}, found source ID {idx} which is "
                        f"not valid for source of size {source_length})")
                image = np.asarray(source[idx][image_index])
                images.append(image)

            shapes = {image.shape for image in images}
            if len(shapes) != 1:
                raise ValueError(
                    f"while merging source images for unit {unit} "
                    f"in layer {layer}, found source images with different "
                    f"sizes: {shapes}")
            (shape,) = tuple(shapes)
            if len(shape) != 3 or shape[0] != 3:
                raise ValueError(
                    f"while merging source images for unit {unit} in layer "
                    f"{layer}, source images should be (3, height, width), "
                    f"got {shape}")

            stacked = np.stack(images)
            if stacked.min() < 0.0 or stacked.max() > 1.0:
                raise ValueError(
                    f"while merging source images for unit {unit} "
                    f"in layer {layer}, found pixel with value not in "
                    "[0, 1]; did you forget to normalize?")

            images_by_unit.append(
                (stacked * 255).clip(0, 255).astype(np.uint8))

        np.save(layer_dir / "images.npy", np.stack(images_by_unit))


def maybe_merge_and_load_dataset(
        root: PathLike,
        source: Optional[str] = None,
        annotations: bool = True,
        force: bool = False,
        image_index: int = 0,
        **kwargs: Any) -> datasets.AnyTopImagesDataset:
    """Load top images, merging local source images first if required.

    Reference: merges.py:159-228.
    """
    root = pathlib.Path(root)
    layer_dirs = [path for path in root.iterdir() if path.is_dir()]

    needs_merge = any(not (layer_dir / "images.npy").exists()
                      for layer_dir in layer_dirs)

    if needs_merge:
        if source is None:
            raise ValueError(">= 1 layers are missing source images "
                             "and no source dataset was provided")
        eg_layer = next(ld for ld in layer_dirs)
        eg_masks_file = eg_layer / "masks.npy"
        if not eg_masks_file.exists():
            raise FileNotFoundError(
                f"tried to find example masks from {eg_masks_file} "
                "but it does not exist?")
        eg_masks = np.load(eg_masks_file, mmap_mode="r")
        source_shape = eg_masks.shape[-2:]

        source_dir = env.data_dir() / source
        if not source_dir.exists():
            key = f"{root.parent.name}/{root.name}"
            raise FileNotFoundError(
                f'milannotations "{key}" is not packaged with source '
                f"images; you need to download the source dataset "
                f"({source}) and store it under $MILAN_DATA_DIR, which "
                "defaults to ./data")
        source_dataset = data_images.SquareResizeImageFolder(
            source_dir, size=source_shape[0], normalize=None)
        merge(root, source_dataset, force=force, image_index=image_index)

    annotations_file = root / "annotations.csv"
    if annotations and annotations_file.exists():
        return datasets.AnnotatedTopImagesDataset(root, **kwargs)
    return datasets.TopImagesDataset(root, **kwargs)
