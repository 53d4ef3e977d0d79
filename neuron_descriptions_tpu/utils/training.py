"""Training utilities (reference: src/utils/training.py).

The reference's splits operate on torch datasets; ours operate on anything
with ``__len__`` and return index-based ``Subset`` views, which all the
dataset classes in this package satisfy.
"""
from typing import Any, Sequence, Tuple

import numpy as np


class EarlyStopping:
    """Observes a numerical value and decides when it stopped improving.

    Reference: src/utils/training.py:12-54.
    """

    def __init__(self, patience: int = 4, decreasing: bool = True):
        self.patience = patience
        self.decreasing = decreasing
        self.best = float("inf") if decreasing else float("-inf")
        self.num_bad = 0

    def __call__(self, value: float) -> bool:
        """Track the new value; return True when patience is exceeded."""
        improved = self.decreasing and value < self.best
        improved |= not self.decreasing and value > self.best
        if improved:
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        return self.num_bad > self.patience

    @property
    def improved(self) -> bool:
        """Check whether the tracked value just improved."""
        return self.num_bad == 0


class Subset:
    """An index-based view over any sized, indexable dataset."""

    def __init__(self, dataset: Any, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __getitem__(self, index: int) -> Any:
        return self.dataset[self.indices[index]]

    def __len__(self) -> int:
        return len(self.indices)


def random_split(dataset: Any,
                 hold_out: float = 0.1,
                 seed: int = 0) -> Tuple[Subset, Subset]:
    """Randomly split a dataset into train/val subsets.

    Reference: src/utils/training.py:57-86.
    """
    if hold_out <= 0 or hold_out >= 1:
        raise ValueError(f"hold_out must be in (0, 1), got {hold_out}")

    size = len(dataset)
    val_size = int(hold_out * size)
    train_size = size - val_size
    for name, split_size in (("train", train_size), ("val", val_size)):
        if split_size == 0:
            raise ValueError(
                f"hold_out={hold_out} causes {name} set size to be zero")

    order = np.random.default_rng(seed).permutation(size)
    val = Subset(dataset, order[:val_size].tolist())
    train = Subset(dataset, order[val_size:].tolist())
    return train, val


class PreloadedImageFolder:
    """An ImageFolder with every decoded image cached in host memory
    (reference: src/utils/training.py:117-165)."""

    def __init__(self, root: Any, *args: Any,
                 display_progress: bool = True, **kwargs: Any):
        from neuron_descriptions_tpu.data import images
        del display_progress
        self.dataset = images.ImageFolder(root, *args, **kwargs)
        self.cached_images = []
        self.cached_labels = []
        for index in range(len(self.dataset)):
            image, label = self.dataset[index]
            self.cached_images.append(image)
            self.cached_labels.append(label)

    def __getitem__(self, index: int) -> Tuple[Any, Any]:
        return self.cached_images[index], self.cached_labels[index]

    def __len__(self) -> int:
        return len(self.dataset)

    @property
    def image_size(self) -> Any:
        return self.dataset.image_size

    @property
    def normalize(self) -> Any:
        return self.dataset.normalize


def fixed_split(dataset: Any,
                indices: Sequence[int]) -> Tuple[Subset, Subset]:
    """Split a dataset on the given indices.

    Returns (subset NOT for indices, subset FOR indices), matching the
    reference (reference: src/utils/training.py:88-110).
    """
    size = len(dataset)
    for index in indices:
        if index < 0 or index >= size:
            raise IndexError(f"dataset index out of bounds: {index}")

    others = sorted(set(range(size)) - set(indices))
    if not others:
        raise ValueError("indices cover entire dataset; nothing to split!")

    return Subset(dataset, others), Subset(dataset, list(indices))
