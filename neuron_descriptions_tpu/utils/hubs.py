"""Declarative model/dataset registries with lazy download.

Rebuild of the reference's hub layer (reference: src/utils/hubs.py):
``ModelConfig``/``ModelHub`` resolve `<models_dir>/<name>.pth` paths,
download from a URL when missing, and hand weights to a factory;
``DatasetConfig``/``DatasetHub`` do the same for zipped dataset archives.

Differences from the reference, driven by the functional model contract:
- model factories receive ``weights=`` as a flat numpy state dict (already
  passed through ``transform_weights``) instead of mutating a module;
- downloads use urllib (no torch.hub dependency) and fail with a clear
  message in offline environments.
"""
import pathlib
import tempfile
import urllib.request
import zipfile
from typing import Any, Callable, Optional

from neuron_descriptions_tpu.utils import env
from neuron_descriptions_tpu.utils.typing import PathLike

__all__ = [
    "HOST",
    "ModelConfig",
    "ModelHub",
    "DatasetConfig",
    "DatasetHub",
    "ConcatDataset",
]

HOST = "http://milan.csail.mit.edu"


def download_file(url: str, file: PathLike) -> None:
    """Download `url` to `file` (reference: torch.hub.download_url_to_file)."""
    file = pathlib.Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    try:
        with urllib.request.urlopen(url) as response, file.open("wb") as out:
            while True:
                chunk = response.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
    except OSError as error:
        raise RuntimeError(
            f"could not download {url} (offline environment?); place the "
            f"file at {file} manually") from error


class ModelConfig:
    """How to instantiate one model, optionally with pretrained weights.

    Reference: src/utils/hubs.py:22-130.

    Args:
        factory: Called with config defaults + runtime kwargs; when weights
            are loaded, also receives ``weights=<flat numpy state dict>``.
        url: Where to fetch the ``.pth`` checkpoint when missing.
        requires_path: Fail if no checkpoint path can be resolved.
        load_weights: Load checkpoint weights at all (False for models whose
            factory embeds its own pretrained source).
        transform_weights: Hook applied to the raw torch payload before
            conversion (e.g. ``lambda w: w['state_dict']``).
    """

    def __init__(self,
                 factory: Callable[..., Any],
                 url: Optional[str] = None,
                 requires_path: bool = False,
                 load_weights: bool = True,
                 transform_weights: Optional[Callable[[Any], Any]] = None,
                 **defaults: Any):
        self.factory = factory
        self.url = url
        self.requires_path = requires_path
        self.load_weights = load_weights
        self.transform_weights = transform_weights
        self.defaults = defaults

    def load(self, path: Optional[PathLike] = None, **kwargs: Any) -> Any:
        """Instantiate the model, downloading weights if necessary."""
        for key, default in self.defaults.items():
            kwargs.setdefault(key, default)

        if path is None and self.requires_path:
            raise ValueError("model requires a weights path, none given")

        if path is not None and (self.load_weights or self.requires_path):
            path = pathlib.Path(path)
            if not path.exists():
                if self.url is None:
                    raise FileNotFoundError(f"model path not found: {path}")
                download_file(self.url, path)

        # Path-consuming factories (e.g. Decoder.load on a payload file) get
        # the resolved path directly (reference: hubs.py:116-120).
        if self.requires_path:
            return self.factory(path, **kwargs)

        if not self.load_weights or path is None:
            return self.factory(**kwargs)

        from neuron_descriptions_tpu.models import torch_import
        weights = torch_import.load_state_dict(
            path, transform=self.transform_weights)
        return self.factory(weights=weights, **kwargs)


class ModelHub:
    """Named collection of model configs (reference: hubs.py:133-170)."""

    def __init__(self, **configs: ModelConfig):
        self.configs = configs

    def load(self, name: str, path: Optional[PathLike] = None,
             **kwargs: Any) -> Any:
        if name not in self.configs:
            raise KeyError(f"no such model in hub: {name}")
        config = self.configs[name]
        if path is None and (config.load_weights or config.requires_path):
            # Reference behavior (hubs.py:166-167): the default path is
            # always <models_dir>/<name>.pth; a weight-loading config whose
            # file is missing (and has no URL) fails loudly rather than
            # silently running random init.
            path = env.models_dir() / f"{name}.pth"
        return config.load(path=path, **kwargs)


class ConcatDataset:
    """Concatenation of datasets (torch ConcatDataset equivalent)."""

    def __init__(self, *datasets: Any):
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for dataset in self.datasets:
            total += len(dataset)
            self._offsets.append(total)

    def __len__(self) -> int:
        return self._offsets[-1] if self._offsets else 0

    def __getitem__(self, index: int) -> Any:
        if index < 0:
            index += len(self)
        previous = 0
        for dataset, offset in zip(self.datasets, self._offsets):
            if index < offset:
                return dataset[index - previous]
            previous = offset
        raise IndexError(index)

    def __add__(self, other: Any) -> "ConcatDataset":
        return ConcatDataset(*self.datasets, other)


class DatasetConfig:
    """How to load one dataset (reference: hubs.py:176-251)."""

    def __init__(self,
                 factory: Callable[..., Any],
                 url: Optional[str] = None,
                 requires_path: bool = True,
                 **defaults: Any):
        self.factory = factory
        self.url = url
        self.requires_path = requires_path
        self.defaults = defaults

    def load(self, path: Optional[PathLike] = None,
             factory: Optional[Callable[..., Any]] = None,
             **kwargs: Any) -> Any:
        if factory is None:
            factory = self.factory
        for key, default in self.defaults.items():
            kwargs.setdefault(key, default)

        if path is None:
            if self.requires_path:
                raise ValueError("dataset requires path, but none given")
            return factory(**kwargs)

        path = pathlib.Path(path)
        if not path.exists() and self.url is not None:
            path.mkdir(parents=True)
            with tempfile.TemporaryDirectory() as tempdir:
                file = pathlib.Path(tempdir) / self.url.split("/")[-1]
                download_file(self.url, file)
                with zipfile.ZipFile(file, "r") as handle:
                    handle.extractall(path)

        if not path.exists():
            raise FileNotFoundError(f"dataset path does not exist: {path}")
        return factory(path, **kwargs)


class DatasetHub:
    """Named collection of dataset configs (reference: hubs.py:254-315)."""

    def __init__(self, **configs: DatasetConfig):
        self.configs = configs

    def load(self, name: str, path: Optional[PathLike] = None,
             **kwargs: Any) -> Any:
        if name not in self.configs:
            raise KeyError(f"no such dataset in hub: {name}")
        config = self.configs[name]
        if path is None and config.requires_path:
            path = env.data_dir() / name
        return config.load(path=path, **kwargs)

    def load_all(self, name: str, *others: str,
                 path: Optional[PathLike] = None, **kwargs: Any) -> Any:
        if path is None:
            path = env.data_dir()
        path = pathlib.Path(path)
        datasets = [self.load(name, path=path / name, **kwargs)]
        for other in others:
            datasets.append(self.load(other, path=path / other, **kwargs))
        if len(datasets) == 1:
            return datasets[0]
        return ConcatDataset(*datasets)
