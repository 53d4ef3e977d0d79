"""Image-folder datasets and deterministic CPU-side preprocessing.

Replaces torchvision ``ImageFolder`` + transform stacks (reference:
src/exemplars/datasets.py:60-75 — Resize(256) → CenterCrop(224) →
ToTensor → Normalize(imagenet)) with a numpy/PIL implementation. Decode and
resize stay on host CPU threads (the TPU analog of DataLoader workers);
arrays are handed to the device pipeline as contiguous float32 NCHW.
"""
import pathlib
from typing import Callable, List, Optional, Tuple

import numpy as np
from PIL import Image

from neuron_descriptions_tpu.data import renormalize
from neuron_descriptions_tpu.utils.typing import PathLike

__all__ = [
    "IMAGE_EXTENSIONS",
    "resize_shorter",
    "center_crop",
    "load_image",
    "ImageFolder",
    "TensorDatasetOnDisk",
]

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")


def resize_shorter(image: Image.Image, size: int) -> Image.Image:
    """Resize so the shorter side equals `size` (torchvision Resize(int))."""
    w, h = image.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return image.resize((new_w, new_h), Image.BILINEAR)


def center_crop(image: Image.Image, size: int) -> Image.Image:
    """Center crop to (size, size) (torchvision CenterCrop)."""
    w, h = image.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return image.crop((left, top, left + size, top + size))


def load_image(path: PathLike,
               resize: Optional[int] = 256,
               crop: Optional[int] = 224,
               normalize: Optional[str] = "imagenet") -> np.ndarray:
    """Load one image as float32 (3, H, W) in the given normalization."""
    with Image.open(path) as image:
        image = image.convert("RGB")
        if resize is not None:
            image = resize_shorter(image, resize)
        if crop is not None:
            image = center_crop(image, crop)
        array = np.asarray(image, dtype=np.float32) / 255.0  # 'pt' space
    array = array.transpose(2, 0, 1)
    if normalize is not None:
        array = renormalize.renormalizer("pt", normalize)(array)
    return np.ascontiguousarray(array, dtype=np.float32)


class ImageFolder:
    """Directory-of-class-directories image dataset.

    Matches torchvision's ImageFolder file discovery: one subdirectory per
    class, sorted class names → indices, sorted file paths within.
    """

    def __init__(self,
                 root: PathLike,
                 resize: Optional[int] = 256,
                 crop: Optional[int] = 224,
                 normalize: Optional[str] = "imagenet",
                 transform: Optional[Callable] = None):
        self.root = pathlib.Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(f"dataset root not found: {self.root}")

        self.classes = sorted(p.name for p in self.root.iterdir()
                              if p.is_dir())
        self.class_to_idx = {name: i for i, name in enumerate(self.classes)}
        self.samples: List[Tuple[pathlib.Path, int]] = []
        for cls in self.classes:
            for path in sorted((self.root / cls).rglob("*")):
                if path.suffix.lower() in IMAGE_EXTENSIONS:
                    self.samples.append((path, self.class_to_idx[cls]))
        if not self.samples:
            raise ValueError(f"no images found under {self.root}")

        self.resize = resize
        self.crop = crop
        self.normalize = normalize
        self.transform = transform

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        path, label = self.samples[index]
        image = load_image(path, resize=self.resize, crop=self.crop,
                           normalize=self.normalize)
        if self.transform is not None:
            image = self.transform(image)
        return image, label

    @property
    def image_size(self) -> Optional[int]:
        """Spatial size of returned images (the crop size)."""
        return self.crop if self.crop is not None else self.resize


class SquareResizeImageFolder(ImageFolder):
    """ImageFolder with exact square Resize((size, size)), no crop.

    Used by the spurious-imagenet datasets (reference:
    src/exemplars/datasets.py:76-89 — Resize((224, 224)) + normalize).
    """

    def __init__(self, root: PathLike, size: int = 224,
                 normalize: Optional[str] = "imagenet", **kwargs):
        super().__init__(root, resize=None, crop=None, normalize=normalize,
                         **kwargs)
        self.size = size

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        path, label = self.samples[index]
        with Image.open(path) as image:
            image = image.convert("RGB")
            image = image.resize((self.size, self.size), Image.BILINEAR)
            array = np.asarray(image, dtype=np.float32) / 255.0
        array = array.transpose(2, 0, 1)
        if self.normalize is not None:
            array = renormalize.renormalizer("pt", self.normalize)(array)
        if self.transform is not None:
            array = self.transform(array)
        return np.ascontiguousarray(array, dtype=np.float32), label

    @property
    def image_size(self) -> int:
        return self.size


class TensorDatasetOnDisk:
    """Dataset over .npy arrays stored in a directory.

    The BigGAN (z, y) representation datasets ship as tensor files
    (reference: src/exemplars/datasets.py:33-52). Each ``.npy`` file in the
    directory is one aligned column; samples are tuples across columns.
    """

    def __init__(self, root: PathLike):
        self.root = pathlib.Path(root)
        files = sorted(self.root.glob("*.npy"))
        if not files:
            raise FileNotFoundError(f"no .npy files under {self.root}")
        self.columns = tuple(np.load(f, mmap_mode="r") for f in files)
        self.names = tuple(f.stem for f in files)
        lengths = {len(c) for c in self.columns}
        if len(lengths) != 1:
            raise ValueError(f"misaligned columns: {lengths}")

    def __len__(self) -> int:
        return len(self.columns[0])

    def __getitem__(self, index: int) -> Tuple[np.ndarray, ...]:
        return tuple(np.asarray(c[index]) for c in self.columns)
