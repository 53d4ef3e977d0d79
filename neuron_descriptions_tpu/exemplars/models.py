"""Configs describing how to compute exemplars for each subject model.

Key-for-key rebuild of the reference registry (reference:
src/exemplars/models.py): ``arch/dataset`` names map to a ``ModelConfig``
holding a factory, optional weight URL + rekeying hook, the default layer
list, and dissection hyperparameters.

The factory contract is functional: each returns a ``SubjectModel`` whose
``apply(params, *inputs) -> (outputs, {layer: activations})`` — taps are
returned, never hooked.
"""
import dataclasses
from typing import (Any, Callable, Dict, Mapping, Optional, Sequence, Tuple)

import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu import models as model_zoo
from neuron_descriptions_tpu.exemplars import datasets, transforms
from neuron_descriptions_tpu.milannotations import loaders as milannotations
from neuron_descriptions_tpu.utils import hubs
from neuron_descriptions_tpu.utils.edict import EasyDict
from neuron_descriptions_tpu.utils.typing import Array, Layer

__all__ = [
    "KEYS", "LAYERS", "SubjectModel", "ModelConfig",
    "ModelExemplarsConfig", "DiscriminativeModelExemplarsConfig",
    "GenerativeModelExemplarsConfig", "default_model_configs",
    "default_model_hub", "load", "rekey_vgg16", "rekey_old_resnet152",
]

HOST = "https://dissect.csail.mit.edu/models"

KEYS = EasyDict(d=dict(milannotations.KEYS))

LAYERS = EasyDict()
LAYERS.ALEXNET = ("conv1", "conv2", "conv3", "conv4", "conv5")
LAYERS.BIGGAN = ("layer0", "layer1", "layer2", "layer3", "layer4", "layer5")
LAYERS.DENSENET121 = (
    "features.conv0",
    *(f"features.denseblock{index}" for index in range(1, 5)))
LAYERS.DENSENET201 = LAYERS.DENSENET121
LAYERS.DINO_VITS8 = tuple(f"blocks.{layer}.mlp.fc1" for layer in range(12))
LAYERS.MOBILENET_V2 = tuple(f"features.{index}" for index in range(0, 19, 2))
LAYERS.RESNET18 = ("conv1", "layer1", "layer2", "layer3", "layer4")
LAYERS.RESNET34 = LAYERS.RESNET18
LAYERS.RESNET50 = LAYERS.RESNET18
LAYERS.RESNET101 = LAYERS.RESNET18
LAYERS.RESNET152 = LAYERS.RESNET18
LAYERS.SHUFFLENET_V2_X1_0 = ("conv1", "stage2", "stage3", "stage4", "conv5")
LAYERS.SQUEEZENET1_0 = tuple(
    f"features.{index}" for index in (0, 3, 4, 5, 7, 8, 9, 10, 12))
LAYERS.VGG11 = model_zoo.vgg.LAYERS[11]
LAYERS.VGG13 = model_zoo.vgg.LAYERS[13]
LAYERS.VGG16 = model_zoo.vgg.LAYERS[16]
LAYERS.VGG19 = model_zoo.vgg.LAYERS[19]


@dataclasses.dataclass
class SubjectModel:
    """A functional subject model: apply + params + dissectable layers."""

    apply: Callable[..., Tuple[Array, Dict[str, Array]]]
    params: Any
    layers: Sequence[Layer]

    def __call__(self, *inputs: Any) -> Tuple[Array, Dict[str, Array]]:
        return self.apply(self.params, *inputs)


def _merge_weights(params: Dict[str, Array],
                   weights: Optional[Mapping[str, np.ndarray]],
                   strict: bool = True) -> Dict[str, Array]:
    """Overlay an imported torch state dict onto our init params.

    Fails loudly rather than silently dissecting random weights (round-4
    finding): unexpected checkpoint keys raise (matching torch
    ``load_state_dict(strict=True)``, the reference's default at
    src/utils/hubs.py:128), shape mismatches raise, and a checkpoint that
    matches zero parameters raises even when ``strict=False``.
    """
    if weights is None:
        return params
    merged = dict(params)
    matched = 0
    unexpected = []
    for name, value in weights.items():
        if name.endswith("num_batches_tracked"):
            continue
        if name not in merged:
            unexpected.append(name)
            continue
        if tuple(merged[name].shape) != tuple(value.shape):
            raise ValueError(f"shape mismatch for {name}: "
                             f"{merged[name].shape} vs {value.shape}")
        merged[name] = jnp.asarray(value)
        matched += 1
    if unexpected and strict:
        raise KeyError(
            f"checkpoint has {len(unexpected)} unexpected weight(s), e.g. "
            f"{unexpected[:5]}; matched {matched}/{len(params)} params")
    if matched == 0:
        raise ValueError(
            "checkpoint matched no parameters "
            f"(checkpoint keys e.g. {list(weights)[:5]}, "
            f"model keys e.g. {list(params)[:5]})")
    return merged


def rekey_old_resnet152(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert Torch7-export ``OldResNet152`` keys to torchvision-style.

    The places365 resnet152 checkpoint addresses a flat Sequential
    (reference: src/deps/resnet152.py:46 — ``0.weight`` stem conv, ``1.*``
    stem BN, stages ``4..7`` of blocks ``s.b.0.{branch}.{idx}``, head
    ``10.1.*``). Computationally the network is identical to torchvision
    resnet152 (stride on the 3x3 conv and on the projection, stages
    3/8/36/3), so the port is purely a key translation onto the zoo arch.
    """
    # Main-branch Sequential index -> torchvision bottleneck child.
    branch_map = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2",
                  "6": "conv3", "7": "bn3"}
    out: Dict[str, Any] = {}
    for name, value in state_dict.items():
        parts = name.split(".")
        if parts[0] == "0":
            out[f"conv1.{parts[-1]}"] = value
        elif parts[0] == "1":
            out[f"bn1.{parts[-1]}"] = value
        elif parts[0] == "10":
            out[f"fc.{parts[-1]}"] = value
        elif parts[0] in ("4", "5", "6", "7"):
            stage = int(parts[0]) - 3
            block, branch, index, leaf = parts[1], parts[3], parts[4:-1], \
                parts[-1]
            if branch == "1":  # projection shortcut
                child = {"0": "downsample.0", "1": "downsample.1"}[index[0]]
            else:
                child = branch_map[index[0]]
            out[f"layer{stage}.{block}.{child}.{leaf}"] = value
        else:
            raise KeyError(f"unrecognized OldResNet152 key: {name}")
    return out


def rekey_vgg16(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert places365-style vgg16 state dict keys to torchvision-style
    (reference: src/exemplars/models.py:62-77)."""
    mappings = dict([("conv1_1", "0"), ("conv1_2", "2"), ("conv2_1", "5"),
                     ("conv2_2", "7"), ("conv3_1", "10"), ("conv3_2", "12"),
                     ("conv3_3", "14"), ("conv4_1", "17"), ("conv4_2", "19"),
                     ("conv4_3", "21"), ("conv5_1", "24"), ("conv5_2", "26"),
                     ("conv5_3", "28"), ("fc6", "0"), ("fc7", "3"),
                     ("fc8", "6"), ("fc8a", "6")])

    def translate(name: str) -> str:
        parts = name.split(".")
        if len(parts) > 1 and parts[1] in mappings:
            parts[1] = mappings[parts[1]]
        return ".".join(parts)

    return {translate(k): v for k, v in state_dict.items()}


# ---------------------------------------------------------------------------
# Exemplar configs (dissection hyperparameters per model).
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ModelExemplarsConfig:
    """Generic dissection configuration (reference: models.py:80-98)."""

    k: Optional[int] = None
    quantile: Optional[float] = None
    output_size: Optional[int] = None
    batch_size: Optional[int] = None
    image_size: Optional[int] = None
    renormalizer: Optional[Any] = None

    @property
    def kwargs(self) -> Mapping[str, Any]:
        return {key: value for key, value in vars(self).items()
                if value is not None}


@dataclasses.dataclass(frozen=True)
class DiscriminativeModelExemplarsConfig(ModelExemplarsConfig):
    """Dissection configuration for a discriminative model."""

    transform_inputs: Optional[Callable] = None
    transform_hiddens: Optional[Callable] = None


@dataclasses.dataclass(frozen=True)
class GenerativeModelExemplarsConfig(ModelExemplarsConfig):
    """Dissection configuration for a generative model."""

    transform_inputs: Optional[Callable] = None
    transform_hiddens: Optional[Callable] = None
    transform_outputs: Optional[Callable] = None
    dataset: Optional[str] = None

    def __post_init__(self) -> None:
        if self.dataset is None:
            raise ValueError("GenerativeModelExemplarsConfig requires "
                             "dataset to be set")

    @property
    def kwargs(self) -> Mapping[str, Any]:
        kwargs = dict(super().kwargs)
        kwargs.pop("dataset", None)
        return kwargs


class ModelConfig(hubs.ModelConfig):
    """A model config that also stores dissection configuration
    (reference: models.py:140-157)."""

    def __init__(self,
                 *args: Any,
                 layers: Optional[Sequence[Layer]] = None,
                 exemplars: Optional[ModelExemplarsConfig] = None,
                 **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.layers = layers
        self.exemplars = exemplars or ModelExemplarsConfig()


# ---------------------------------------------------------------------------
# Factories.
# ---------------------------------------------------------------------------
def _resnet_factory(depth: int, num_classes: int = 1000, seed: int = 0,
                    weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.resnet.init(jax.random.PRNGKey(seed), depth,
                                   num_classes)
    params = _merge_weights(params, weights)

    def apply(p, x, **kwargs):
        return model_zoo.resnet.apply(p, x, depth=depth, **kwargs)

    return SubjectModel(apply=apply, params=params,
                        layers=model_zoo.resnet.LAYERS)


def _alexnet_factory(num_classes: int = 1000, seed: int = 0,
                     weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.alexnet.init(jax.random.PRNGKey(seed), num_classes)
    params = _merge_weights(params, weights)
    return SubjectModel(apply=model_zoo.alexnet.apply, params=params,
                        layers=model_zoo.alexnet.LAYERS)


def _alexnet_places365_factory(num_classes: int = 365, seed: int = 0,
                               weights: Optional[Mapping] = None
                               ) -> SubjectModel:
    params = model_zoo.alexnet.init_places365(jax.random.PRNGKey(seed),
                                              num_classes)
    params = _merge_weights(params, weights)
    return SubjectModel(apply=model_zoo.alexnet.apply_places365,
                        params=params, layers=model_zoo.alexnet.LAYERS)


def _vgg_factory(depth: int, num_classes: int = 1000, seed: int = 0,
                 weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.vgg.init(jax.random.PRNGKey(seed), depth, num_classes)
    params = _merge_weights(params, weights)

    def apply(p, x, **kwargs):
        return model_zoo.vgg.apply(p, x, depth=depth, **kwargs)

    return SubjectModel(apply=apply, params=params,
                        layers=model_zoo.vgg.LAYERS[depth])


def _old_resnet152_factory(num_classes: int = 365, seed: int = 0,
                           weights: Optional[Mapping] = None) -> SubjectModel:
    """places365 ResNet-152 with the reference's integer layer addressing
    (reference: src/exemplars/models.py:321-326 hooks layers 0,4,5,6,7 of
    the flat Torch7-export Sequential)."""
    params = model_zoo.resnet.init(jax.random.PRNGKey(seed), 152,
                                   num_classes)
    params = _merge_weights(params, weights)

    aliases = {"0": "conv1", "4": "layer1", "5": "layer2", "6": "layer3",
               "7": "layer4"}

    def apply(p, x, edits=None):
        edits = dict(edits or {})
        for alias, layer in aliases.items():
            if alias in edits:
                edits[layer] = edits.pop(alias)
        out, taps = model_zoo.resnet.apply(p, x, depth=152, edits=edits)
        for alias, layer in aliases.items():
            taps[alias] = taps[layer]
        return out, taps

    return SubjectModel(apply=apply, params=params,
                        layers=tuple(aliases))


def _vit_factory(seed: int = 0,
                 weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.vit.init(jax.random.PRNGKey(seed))
    params = _merge_weights(params, weights, strict=False)
    return SubjectModel(apply=model_zoo.vit.apply, params=params,
                        layers=model_zoo.vit.LAYERS)


def _biggan_factory(n_classes: int = 1000, seed: int = 0,
                    weights: Optional[Mapping] = None) -> SubjectModel:
    """BigGAN-256 generator with hookable stage taps (the SeqBigGAN layering,
    reference: src/deps/ext/pretorched/gans/biggan.py:134-154)."""
    params = model_zoo.biggan.init(jax.random.PRNGKey(seed), n_classes)
    # tfhub-converted checkpoints carry extra optimizer/meta entries;
    # non-strict, but _merge_weights still raises on zero matches.
    params = _merge_weights(params, weights, strict=False)
    return SubjectModel(apply=model_zoo.biggan.apply, params=params,
                        layers=model_zoo.biggan.LAYERS)


def _densenet_factory(depth: int, num_classes: int = 1000, seed: int = 0,
                      weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.densenet.init(jax.random.PRNGKey(seed), depth,
                                     num_classes)
    params = _merge_weights(params, weights)

    def apply(p, x, **kwargs):
        return model_zoo.densenet.apply(p, x, depth=depth, **kwargs)

    return SubjectModel(apply=apply, params=params,
                        layers=model_zoo.densenet.LAYERS)


def _mobilenet_factory(num_classes: int = 1000, seed: int = 0,
                       weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.mobilenet.init(jax.random.PRNGKey(seed), num_classes)
    params = _merge_weights(params, weights)
    return SubjectModel(apply=model_zoo.mobilenet.apply, params=params,
                        layers=model_zoo.mobilenet.LAYERS)


def _shufflenet_factory(num_classes: int = 1000, seed: int = 0,
                        weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.shufflenet.init(jax.random.PRNGKey(seed), num_classes)
    params = _merge_weights(params, weights)
    return SubjectModel(apply=model_zoo.shufflenet.apply, params=params,
                        layers=model_zoo.shufflenet.LAYERS)


def _squeezenet_factory(num_classes: int = 1000, seed: int = 0,
                        weights: Optional[Mapping] = None) -> SubjectModel:
    params = model_zoo.squeezenet.init(jax.random.PRNGKey(seed), num_classes)
    params = _merge_weights(params, weights)
    return SubjectModel(apply=model_zoo.squeezenet.apply, params=params,
                        layers=model_zoo.squeezenet.LAYERS)


def _partial(fn: Callable, **bound: Any) -> Callable:
    def factory(**kwargs: Any):
        return fn(**{**bound, **kwargs})

    return factory


# ---------------------------------------------------------------------------
# Registry.
# ---------------------------------------------------------------------------
def default_model_configs(**others: ModelConfig) -> Mapping[str, ModelConfig]:
    """Return the default model configs (reference: models.py:160-403)."""
    configs: Dict[str, ModelConfig] = {}

    # --- AlexNet ---
    configs[KEYS.ALEXNET_IMAGENET] = ModelConfig(
        _alexnet_factory,
        url=f"{hubs.HOST}/models/alexnet-imagenet.pth",
        layers=LAYERS.ALEXNET)
    configs[KEYS.ALEXNET_IMAGENET_BLURRED] = ModelConfig(
        _alexnet_factory, layers=tuple(
            f"features.{i}" for i in (0, 3, 6, 8, 10)))
    configs[KEYS.ALEXNET_PLACES365] = ModelConfig(
        _alexnet_places365_factory,
        url=f"{hubs.HOST}/models/alexnet-places365.pth",
        transform_weights=lambda weights: weights["state_dict"],
        layers=LAYERS.ALEXNET)

    # --- VGG ---
    for depth in (11, 13, 16, 19):
        key = KEYS[f"VGG{depth}_IMAGENET"]
        configs[key] = ModelConfig(_partial(_vgg_factory, depth=depth),
                                   url=f"{hubs.HOST}/models/vgg{depth}-"
                                       "imagenet.pth",
                                   layers=LAYERS[f"VGG{depth}"])
        blurred = KEYS[f"VGG{depth}_IMAGENET_BLURRED"]
        configs[blurred] = ModelConfig(_partial(_vgg_factory, depth=depth),
                                       layers=LAYERS[f"VGG{depth}"])
    configs[KEYS.VGG16_PLACES365] = ModelConfig(
        _partial(_vgg_factory, depth=16, num_classes=365),
        url=f"{HOST}/vgg16_places365-0bafbc55.pth",
        transform_weights=rekey_vgg16,
        layers=LAYERS.VGG16)

    # --- ResNets ---
    for depth in (18, 34, 50, 101, 152):
        key = KEYS[f"RESNET{depth}_IMAGENET"]
        configs[key] = ModelConfig(_partial(_resnet_factory, depth=depth),
                                   url=f"{hubs.HOST}/models/resnet{depth}-"
                                       "imagenet.pth",
                                   layers=LAYERS[f"RESNET{depth}"])
        blurred = KEYS[f"RESNET{depth}_IMAGENET_BLURRED"]
        configs[blurred] = ModelConfig(_partial(_resnet_factory, depth=depth),
                                       layers=LAYERS[f"RESNET{depth}"])
    configs[KEYS.RESNET18_PLACES365] = ModelConfig(
        _partial(_resnet_factory, depth=18, num_classes=365),
        url=f"{HOST}/resnet18_places365-2f475921.pth",
        transform_weights=lambda weights: weights["state_dict"],
        layers=LAYERS.RESNET18)
    configs[KEYS.RESNET152_PLACES365] = ModelConfig(
        _old_resnet152_factory,
        url=f"{HOST}/resnet152_places365-f928166e5c.pth",
        transform_weights=rekey_old_resnet152,
        layers=("0", "4", "5", "6", "7"))

    # --- DINO ViT-S/8 ---
    configs[KEYS.DINO_VITS8_IMAGENET] = ModelConfig(
        _vit_factory,
        url=("https://dl.fbaipublicfiles.com/dino/"
             "dino_deitsmall8_pretrain/dino_deitsmall8_pretrain.pth"),
        layers=LAYERS.DINO_VITS8,
        exemplars=DiscriminativeModelExemplarsConfig(
            transform_hiddens=transforms.spatialize_vit_mlp,
            batch_size=32))

    # --- BigGAN (generative; reference: models.py:189-218) ---
    from neuron_descriptions_tpu.data import renormalize as renorm
    biggan_urls = {
        KEYS.BIGGAN_IMAGENET: ("http://ganocracy.csail.mit.edu/models/"
                               "tfbiggan_256-a4cf3382.pth", 1000),
        KEYS.BIGGAN_PLACES365: ("http://pretorched-x.csail.mit.edu/gans/"
                                "BigGAN/biggan256_G_ema_ch96_places365"
                                "-ac277771.pth", 365),
    }
    for dataset_key, zs_key in (
            (KEYS.BIGGAN_IMAGENET, datasets.KEYS.BIGGAN_ZS_IMAGENET),
            (KEYS.BIGGAN_PLACES365, datasets.KEYS.BIGGAN_ZS_PLACES365)):
        url, n_classes = biggan_urls[dataset_key]
        configs[dataset_key] = ModelConfig(
            _partial(_biggan_factory, n_classes=n_classes),
            url=url,
            layers=LAYERS.BIGGAN,
            exemplars=GenerativeModelExemplarsConfig(
                renormalizer=renorm.renormalizer(target="byte"),
                image_size=256,
                batch_size=32,
                dataset=zs_key))

    # --- audit-zoo architectures (reference: models.py:234-347) ---
    for arch, factory, layer_list in (
            ("densenet121", _partial(_densenet_factory, depth=121),
             LAYERS.DENSENET121),
            ("densenet201", _partial(_densenet_factory, depth=201),
             LAYERS.DENSENET201),
            ("mobilenet_v2", _mobilenet_factory, LAYERS.MOBILENET_V2),
            ("shufflenet_v2_x1_0", _shufflenet_factory,
             LAYERS.SHUFFLENET_V2_X1_0),
            ("squeezenet1_0", _squeezenet_factory, LAYERS.SQUEEZENET1_0)):
        configs[f"{arch}/imagenet"] = ModelConfig(
            factory, url=f"{hubs.HOST}/models/{arch}-imagenet.pth",
            layers=layer_list)
        configs[f"{arch}/imagenet-blurred"] = ModelConfig(
            factory, layers=layer_list)

    configs.update(others)
    return configs


def default_model_hub(**others: ModelConfig) -> hubs.ModelHub:
    """Return configs for all models we can extract exemplars for."""
    return hubs.ModelHub(**default_model_configs(**others))


Model = Tuple[SubjectModel, Sequence[Layer], ModelConfig]


def load(name: str,
         configs: Optional[Mapping[str, ModelConfig]] = None,
         **kwargs: Any) -> Model:
    """Load a model plus its dissectable layers and config
    (reference: models.py:415-442)."""
    configs = configs or {}
    hub = default_model_hub(**configs)
    model = hub.load(name, **kwargs)

    config = hub.configs[name]
    assert isinstance(config, ModelConfig), "unknown config type"
    layers = config.layers
    if layers is None:
        layers = list(model.layers)
    return model, layers, config
