"""Loading prepackaged MILANNOTATIONS data.

Key-for-key rebuild of the reference's loader registry (reference:
src/milannotations/loaders.py): the ``KEYS`` namespace of arch/dataset
names, the generalization-split ``DATASET_GROUPINGS``, per-key download
configs, and the ``load()`` entry point.
"""
import pathlib
from typing import Any, Mapping, Optional

from neuron_descriptions_tpu.milannotations import datasets, merges
from neuron_descriptions_tpu.utils import env, hubs
from neuron_descriptions_tpu.utils.edict import EasyDict

__all__ = ["KEYS", "DATASET_GROUPINGS", "default_dataset_configs",
           "default_dataset_hub", "load"]

KEYS = EasyDict()
KEYS.ALEXNET = "alexnet"
KEYS.BIGGAN = "biggan"
KEYS.DENSENET121 = "densenet121"
KEYS.DENSENET201 = "densenet201"
KEYS.DINO_VITS8 = "dino_vits8"
KEYS.RESNET18 = "resnet18"
KEYS.RESNET34 = "resnet34"
KEYS.RESNET50 = "resnet50"
KEYS.RESNET101 = "resnet101"
KEYS.RESNET152 = "resnet152"
KEYS.VGG11 = "vgg11"
KEYS.VGG13 = "vgg13"
KEYS.VGG16 = "vgg16"
KEYS.VGG19 = "vgg19"
KEYS.MOBILENET_V2 = "mobilenet_v2"
KEYS.SHUFFLENET_V2_X1_0 = "shufflenet_v2_x1_0"
KEYS.SQUEEZENET1_0 = "squeezenet1_0"

KEYS.IMAGENET = "imagenet"
KEYS.IMAGENET_BLURRED = "imagenet-blurred"
KEYS.PLACES365 = "places365"

_ARCHS = ("ALEXNET", "BIGGAN", "DENSENET121", "DENSENET201", "DINO_VITS8",
          "MOBILENET_V2", "RESNET18", "RESNET34", "RESNET50", "RESNET101",
          "RESNET152", "SHUFFLENET_V2_X1_0", "SQUEEZENET1_0", "VGG11",
          "VGG13", "VGG16", "VGG19")
for _arch in _ARCHS:
    KEYS[f"{_arch}_IMAGENET"] = f"{KEYS[_arch]}/{KEYS.IMAGENET}"
for _arch in ("ALEXNET", "VGG16", "RESNET18", "RESNET152", "BIGGAN"):
    KEYS[f"{_arch}_PLACES365"] = f"{KEYS[_arch]}/{KEYS.PLACES365}"
for _arch in ("ALEXNET", "DENSENET121", "DENSENET201", "RESNET18",
              "RESNET34", "RESNET50", "RESNET101", "RESNET152", "VGG11",
              "VGG13", "VGG16", "VGG19", "MOBILENET_V2",
              "SHUFFLENET_V2_X1_0", "SQUEEZENET1_0"):
    KEYS[f"{_arch}_IMAGENET_BLURRED"] = (
        f"{KEYS[_arch]}/{KEYS.IMAGENET_BLURRED}")

KEYS.GENERATORS = "gen"
KEYS.CLASSIFIERS = "cls"
KEYS.BASE = "base"
KEYS.NOT_ALEXNET_IMAGENET = f"not-{KEYS.ALEXNET}-{KEYS.IMAGENET}"
KEYS.NOT_ALEXNET_PLACES365 = f"not-{KEYS.ALEXNET}-{KEYS.PLACES365}"
KEYS.NOT_RESNET152_IMAGENET = f"not-{KEYS.RESNET152}-{KEYS.IMAGENET}"
KEYS.NOT_RESNET152_PLACES365 = f"not-{KEYS.RESNET152}-{KEYS.PLACES365}"
KEYS.NOT_BIGGAN_IMAGENET = f"not-{KEYS.BIGGAN}-{KEYS.IMAGENET}"
KEYS.NOT_BIGGAN_PLACES365 = f"not-{KEYS.BIGGAN}-{KEYS.PLACES365}"

# Partitions of MILANNOTATIONS matching the paper's generalization splits
# (reference: loaders.py:91-174).
DATASET_GROUPINGS = {
    KEYS.BASE: (
        KEYS.ALEXNET_IMAGENET,
        KEYS.ALEXNET_PLACES365,
        KEYS.RESNET152_IMAGENET,
        KEYS.RESNET152_PLACES365,
        KEYS.BIGGAN_IMAGENET,
        KEYS.BIGGAN_PLACES365,
    ),
    KEYS.CLASSIFIERS: (
        KEYS.ALEXNET_IMAGENET,
        KEYS.ALEXNET_PLACES365,
        KEYS.RESNET152_IMAGENET,
        KEYS.RESNET152_PLACES365,
    ),
    KEYS.GENERATORS: (
        KEYS.BIGGAN_IMAGENET,
        KEYS.BIGGAN_PLACES365,
    ),
    KEYS.IMAGENET: (
        KEYS.ALEXNET_IMAGENET,
        KEYS.RESNET152_IMAGENET,
        KEYS.BIGGAN_IMAGENET,
    ),
    KEYS.PLACES365: (
        KEYS.ALEXNET_PLACES365,
        KEYS.RESNET152_PLACES365,
        KEYS.BIGGAN_PLACES365,
    ),
    KEYS.ALEXNET: (
        KEYS.ALEXNET_IMAGENET,
        KEYS.ALEXNET_PLACES365,
    ),
    KEYS.RESNET152: (
        KEYS.RESNET152_IMAGENET,
        KEYS.RESNET152_PLACES365,
    ),
    KEYS.BIGGAN: (
        KEYS.BIGGAN_IMAGENET,
        KEYS.BIGGAN_PLACES365,
    ),
}
for _excluded in ("ALEXNET_IMAGENET", "ALEXNET_PLACES365",
                  "RESNET152_IMAGENET", "RESNET152_PLACES365",
                  "BIGGAN_IMAGENET", "BIGGAN_PLACES365"):
    _not_key = KEYS[f"NOT_{_excluded}"]
    DATASET_GROUPINGS[_not_key] = tuple(
        key for key in DATASET_GROUPINGS[KEYS.BASE]
        if key != KEYS[_excluded])


def default_dataset_configs(
        **others: hubs.DatasetConfig) -> Mapping[str, hubs.DatasetConfig]:
    """Return the default MILANNOTATIONS configs
    (reference: loaders.py:177-218)."""
    configs = {}

    # Annotated models.
    for key in (KEYS.ALEXNET_IMAGENET, KEYS.ALEXNET_PLACES365,
                KEYS.BIGGAN_IMAGENET, KEYS.BIGGAN_PLACES365,
                KEYS.DINO_VITS8_IMAGENET, KEYS.RESNET152_IMAGENET,
                KEYS.RESNET152_PLACES365):
        arch, dataset = key.split("/")
        configs[key] = hubs.DatasetConfig(
            merges.maybe_merge_and_load_dataset,
            url=f"{hubs.HOST}/data/{arch}-{dataset}.zip",
            source=f"{dataset}/val" if arch != KEYS.BIGGAN else None,
            annotation_count=3)

    # Models with blurred-imagenet versions (distributed separately).
    for model in (KEYS.ALEXNET, KEYS.RESNET152):
        key = KEYS[f"{model.upper()}_IMAGENET_BLURRED"]
        configs[key] = hubs.DatasetConfig(merges.maybe_merge_and_load_dataset)

    # Models with places365 versions.
    for model in (KEYS.RESNET18,):
        key = KEYS[f"{model.upper()}_PLACES365"]
        configs[key] = hubs.DatasetConfig(merges.maybe_merge_and_load_dataset,
                                          source="places365/val")

    # All other models with imagenet/blurred-imagenet versions.
    for model in (KEYS.DENSENET121, KEYS.DENSENET201, KEYS.MOBILENET_V2,
                  KEYS.RESNET18, KEYS.RESNET34, KEYS.RESNET50,
                  KEYS.RESNET101, KEYS.SHUFFLENET_V2_X1_0,
                  KEYS.SQUEEZENET1_0, KEYS.VGG11, KEYS.VGG13, KEYS.VGG16,
                  KEYS.VGG19):
        for dataset in (KEYS.IMAGENET, KEYS.IMAGENET_BLURRED):
            key = KEYS[
                f'{model.upper()}_{dataset.upper().replace("-", "_")}']
            configs[key] = hubs.DatasetConfig(
                merges.maybe_merge_and_load_dataset)

    configs.update(others)
    return configs


def default_dataset_hub(**others: hubs.DatasetConfig) -> hubs.DatasetHub:
    """Return all dataset configs."""
    return hubs.DatasetHub(**default_dataset_configs(**others))


def load(name: str = "base",
         configs: Optional[Mapping[str, hubs.DatasetConfig]] = None,
         **kwargs: Any) -> Any:
    """Load some or all of MILANNOTATIONS (reference: loaders.py:227-268).

    Args:
        name: A single ``arch/dataset`` key, a grouping from
            ``DATASET_GROUPINGS``, or a raw directory path under the data
            dir.
    """
    configs = configs or {}
    dataset_hub = default_dataset_hub(**configs)
    if name in DATASET_GROUPINGS:
        return dataset_hub.load_all(*DATASET_GROUPINGS[name], **kwargs)
    if name in dataset_hub.configs:
        return dataset_hub.load(name, **kwargs)

    path = pathlib.Path(kwargs.get("path", env.data_dir() / name))
    if not path.exists():
        raise KeyError(f"unknown milannotations set: {name}")
    kwargs.setdefault("path", path)
    dataset_hub = hubs.DatasetHub(
        **{name: hubs.DatasetConfig(datasets.TopImagesDataset)})
    return dataset_hub.load(name, **kwargs)
