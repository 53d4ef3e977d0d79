"""The visual encoder component of MILAN, rebuilt TPU-first.

Maps image regions (image + activation mask) to feature vectors by reading
intermediate activations of a pretrained classifier and pooling them under
the mask (reference: src/milan/encoders.py).

TPU design: the backbone is a pure function from the zoo
(``models/{alexnet,resnet}.py``) that *returns* its taps — no hooking — and
the whole featurize step (normalize → backbone → per-level mask resize →
masked pool → concat) is one jitted function. ``map()`` runs it over a
dataset with a fixed batch shape (final partial batch padded) so XLA
compiles exactly one program; batches stream through the host loader.

Parameter keys match the torch module tree of the reference
(``encoder.model.<backbone key>`` plus ``mean``/``std`` buffers —
reference: encoders.py:274,283-284 wrap the classifier in
``nethook.InstrumentedModel`` whose submodule is named ``model``), so
pretrained MILAN payload state dicts drop in unchanged.
"""
from typing import (Any, Callable, Dict, Mapping, Optional, Sequence, Tuple,
                    Type)

import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu.data import renormalize
from neuron_descriptions_tpu.models import alexnet as alexnet_zoo
from neuron_descriptions_tpu.models import resnet as resnet_zoo
from neuron_descriptions_tpu.utils import serialize
from neuron_descriptions_tpu.utils.typing import Array

__all__ = [
    "Encoder",
    "PyramidConvEncoder",
    "SpatialConvEncoder",
    "encoder",
    "parse",
    "key",
    "KIND_PYRAMID",
    "KIND_SPATIAL",
]


class Encoder(serialize.SerializableParams):
    """Abstract mapping from images (+ optional masks) to features.

    Reference: src/milan/encoders.py:23-148. Subclasses define
    ``feature_shape`` and ``forward``; ``map`` featurizes a whole dataset.
    """

    feature_shape: Tuple[int, ...]

    def __call__(self, images: Any, masks: Optional[Any] = None,
                 **kwargs: Any) -> Array:
        return self.forward(images, masks=masks, **kwargs)

    def forward(self, images: Any, masks: Optional[Any] = None,
                **kwargs: Any) -> Array:
        raise NotImplementedError

    def map(self,
            dataset: Any,
            mask: bool = True,
            image_index: int = -3,
            mask_index: int = -2,
            batch_size: int = 64,
            display_progress_as: Any = True,
            **kwargs: Any) -> np.ndarray:
        """Featurize an entire dataset (reference: encoders.py:61-148).

        Returns a numpy array of shape (len(dataset), k, *feature_shape)
        (the analog of the reference's TensorDataset of features).
        """
        del display_progress_as  # progress keys are cosmetic; omitted
        mapped = []
        for start in range(0, len(dataset), batch_size):
            stop = min(start + batch_size, len(dataset))
            samples = [dataset[i] for i in range(start, stop)]
            images = np.stack([np.asarray(s[image_index]) for s in samples])
            masks = None
            if mask:
                masks = np.stack([np.asarray(s[mask_index])
                                  for s in samples])
            shape = images.shape
            flat_images = images.reshape(-1, *shape[-3:])
            flat_masks = (masks.reshape(-1, *masks.shape[-3:])
                          if masks is not None else None)
            features = self.forward(jnp.asarray(flat_images),
                                    None if flat_masks is None
                                    else jnp.asarray(flat_masks), **kwargs)
            features = np.asarray(features)
            mapped.append(features.reshape(*shape[:-3], *self.feature_shape))
        return np.concatenate(mapped)

    def properties(self) -> serialize.Properties:
        raise NotImplementedError


# config name -> (init fn, apply fn returning (out, taps), tap names,
#                 feature size)
_BACKBONES: Dict[str, Tuple[Callable, Callable, Sequence[str], int]] = {
    "alexnet": (
        lambda key: alexnet_zoo.init(key),
        lambda p, x: alexnet_zoo.apply(p, x),
        ("features.0", "features.3", "features.6", "features.8",
         "features.10"),
        1152,
    ),
    "resnet18": (
        lambda key: resnet_zoo.init(key, 18),
        lambda p, x: resnet_zoo.apply(p, x, depth=18),
        ("conv1", "layer1", "layer2", "layer3", "layer4"),
        1024,
    ),
    "resnet50": (
        lambda key: resnet_zoo.init(key, 50),
        lambda p, x: resnet_zoo.apply(p, x, depth=50),
        ("conv1", "layer1", "layer2", "layer3", "layer4"),
        3904,
    ),
    "resnet101": (
        lambda key: resnet_zoo.init(key, 101),
        lambda p, x: resnet_zoo.apply(p, x, depth=101),
        ("conv1", "layer1", "layer2", "layer3", "layer4"),
        3904,
    ),
}


def resize_bilinear(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize with torch ``F.interpolate(align_corners=False)``
    semantics (half-pixel centers, source clamped at 0, NO antialiasing —
    ``jax.image.resize`` antialiases on downsample, which would shift mask
    weights and break checkpoint parity).

    Args:
        x: (..., H, W) input.
    """
    in_h, in_w = x.shape[-2:]

    def axis_weights(in_size: int, out_size: int):
        src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        src = jnp.maximum(src, 0.0)
        lo = jnp.minimum(jnp.floor(src), in_size - 1).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = src - lo
        return lo, hi, frac

    y0, y1, wy = axis_weights(in_h, out_h)
    x0, x1, wx = axis_weights(in_w, out_w)

    top = x[..., y0, :] * (1 - wy)[:, None] + x[..., y1, :] * wy[:, None]
    return top[..., x0] * (1 - wx) + top[..., x1] * wx


def _pyramid_pool(taps: Sequence[Array], masks: Array) -> Array:
    """Mask-weighted pooling over a feature pyramid.

    Per level (reference: encoders.py:301-320): bilinear-downsample the mask
    to feature resolution (align_corners=False), sum-normalize it (guarding
    all-zero masks), then take the mask-weighted spatial sum of the
    features. Levels concat into one vector. Everything fuses into the
    backbone's XLA program.
    """
    pooled = []
    for fs in taps:
        ms = resize_bilinear(masks, *fs.shape[-2:])
        sums = ms.sum(axis=(-1, -2), keepdims=True)
        # all-zero masks are left unnormalized (pool result is zero anyway).
        safe = jnp.where(jnp.isclose(sums, 0.0), 1.0, sums)
        ms = jnp.where(jnp.isclose(sums, 0.0), ms, ms / safe)
        pooled.append((fs * ms).sum(axis=(-1, -2)))
    return jnp.concatenate(pooled, axis=-1)


class PyramidConvEncoder(Encoder):
    """Masked multi-resolution CNN features pooled into one vector.

    Reference: src/milan/encoders.py:243-351. This is the featurizer of
    every pretrained MILAN checkpoint (resnet101 → 3904-d for the published
    models).
    """

    def __init__(self, config: str = "resnet50",
                 state_dict: Optional[Mapping[str, np.ndarray]] = None,
                 seed: int = 0,
                 **kwargs: Any):
        if config not in _BACKBONES:
            raise ValueError(f"encoder not supported: {config}")
        self.config = config
        self.kwargs = dict(kwargs)
        # The reference forwards kwargs to torchvision and records
        # pretrained=True in payload properties; we accept it for payload
        # round-trip compatibility (weights arrive via state_dict).
        self.kwargs.setdefault("pretrained", True)

        init_fn, apply_fn, layers, feature_size = _BACKBONES[config]
        self.layers = tuple(layers)
        self.feature_shape = (feature_size,)
        self._apply_backbone = apply_fn

        self.params: Dict[str, Array] = {
            name: jnp.asarray(value)
            for name, value in init_fn(jax.random.PRNGKey(seed)).items()
        }
        mean, std = renormalize.OFFSET_SCALE["imagenet"]
        self.mean = jnp.asarray(mean, jnp.float32).reshape(1, 3, 1, 1)
        self.std = jnp.asarray(std, jnp.float32).reshape(1, 3, 1, 1)

        if state_dict is not None:
            self.load_state_dict(state_dict)

        self._jitted = jax.jit(self._forward, static_argnums=5)

    def _forward(self, params: Mapping[str, Array], mean: Array, std: Array,
                 images: Array, masks: Array,
                 normalize: bool = True) -> Array:
        if normalize:
            images = (images - mean) / std
        _, taps = self._apply_backbone(params, images)
        return _pyramid_pool([taps[layer] for layer in self.layers], masks)

    def forward(self, images: Array, masks: Optional[Array] = None,
                normalize: bool = True) -> Array:
        """Featurize images under masks → (batch, feature_size)."""
        images = jnp.asarray(images, jnp.float32)
        if masks is None:
            masks = jnp.ones((images.shape[0], 1) + images.shape[2:],
                             images.dtype)
        masks = jnp.asarray(masks, jnp.float32)
        return self._jitted(self.params, self.mean, self.std, images, masks,
                            normalize)

    def load_state_dict(self, state_dict: Mapping[str, np.ndarray]) -> None:
        """Ingest a torch-keyed state dict.

        The reference nests the classifier as
        ``encoder (InstrumentedModel) . model . <torchvision key>``
        (reference: encoders.py:274 + nethook.InstrumentedModel), so inside
        a Decoder payload the backbone keys arrive here as
        ``encoder.model.*`` alongside the ``mean``/``std`` buffers.
        """
        matched = 0
        for name, value in state_dict.items():
            if name == "mean":
                self.mean = jnp.asarray(value, jnp.float32)
                matched += 1
            elif name == "std":
                self.std = jnp.asarray(value, jnp.float32)
                matched += 1
            elif name.startswith("encoder.model."):
                stripped = name[len("encoder.model."):]
                if stripped.endswith("num_batches_tracked"):
                    continue
                if stripped not in self.params:
                    raise KeyError(
                        f"unexpected encoder weight: {name}")
                expected = tuple(self.params[stripped].shape)
                if expected != tuple(np.shape(value)):
                    raise ValueError(
                        f"shape mismatch for {name}: {expected} vs "
                        f"{np.shape(value)}")
                self.params[stripped] = jnp.asarray(value)
                matched += 1
            elif not name.endswith("num_batches_tracked"):
                raise KeyError(f"unexpected encoder weight: {name}")
        if not matched:
            raise ValueError("encoder state dict matched no parameters")

    def state_dict(self) -> Dict[str, np.ndarray]:
        out = {f"encoder.model.{name}": np.asarray(value)
               for name, value in self.params.items()}
        out["mean"] = np.asarray(self.mean)
        out["std"] = np.asarray(self.std)
        return out

    def properties(self) -> serialize.Properties:
        return {"config": self.config, **self.kwargs}

    @classmethod
    def deserialize(cls, serialized: Mapping[str, Any],
                    **kwargs: Any) -> "PyramidConvEncoder":
        properties = dict(serialized["properties"])
        properties.pop("pretrained", None)
        state_dict = serialized.get("state_dict")
        if state_dict is not None and kwargs.get("load_state_dict", True):
            properties["state_dict"] = state_dict
        return cls(**properties)


class SpatialConvEncoder(Encoder):
    """Spatial conv features of the masked image
    (reference: encoders.py:159-236).

    Multiplies the image by its mask, then returns the flattened layer4
    features of a resnet18 as (n_features, feature_size) = (49, 512).
    """

    def __init__(self, config: str = "resnet18",
                 state_dict: Optional[Mapping[str, np.ndarray]] = None,
                 seed: int = 0,
                 **kwargs: Any):
        if config != "resnet18":
            raise ValueError(f"encoder not supported: {config}")
        self.config = config
        self.kwargs = dict(kwargs)
        self.kwargs.setdefault("pretrained", True)
        self.layer = "layer4"
        self.feature_shape = (49, 512)

        self.params: Dict[str, Array] = {
            name: jnp.asarray(value)
            for name, value in resnet_zoo.init(jax.random.PRNGKey(seed),
                                               18).items()
        }
        mean, std = renormalize.OFFSET_SCALE["imagenet"]
        self.mean = jnp.asarray(mean, jnp.float32).reshape(1, 3, 1, 1)
        self.std = jnp.asarray(std, jnp.float32).reshape(1, 3, 1, 1)
        if state_dict is not None:
            self.load_state_dict(state_dict)
        self._jitted = jax.jit(self._forward, static_argnums=5)

    def _forward(self, params: Mapping[str, Array], mean: Array, std: Array,
                 images: Array, masks: Array,
                 normalize: bool = True) -> Array:
        if normalize:
            images = (images - mean) / std
        _, taps = resnet_zoo.apply(params, images * masks, depth=18)
        features = taps[self.layer]  # (n, 512, 7, 7)
        n, c = features.shape[:2]
        features = jnp.moveaxis(features, 1, -1)  # NHWC
        return features.reshape(n, -1, c)

    def forward(self, images: Array, masks: Optional[Array] = None,
                normalize: bool = True) -> Array:
        images = jnp.asarray(images, jnp.float32)
        if masks is None:
            masks = jnp.ones((images.shape[0], 1) + images.shape[2:],
                             images.dtype)
        masks = jnp.asarray(masks, jnp.float32)
        return self._jitted(self.params, self.mean, self.std, images, masks,
                            normalize)

    def map(self, *args: Any, **kwargs: Any) -> np.ndarray:
        kwargs.setdefault("mask", False)
        kwargs.setdefault("image_index", 0)
        return super().map(*args, **kwargs)

    load_state_dict = PyramidConvEncoder.load_state_dict
    state_dict = PyramidConvEncoder.state_dict

    def properties(self) -> serialize.Properties:
        return {"config": self.config, **self.kwargs}

    @classmethod
    def deserialize(cls, serialized: Mapping[str, Any],
                    **kwargs: Any) -> "SpatialConvEncoder":
        properties = dict(serialized["properties"])
        properties.pop("pretrained", None)
        state_dict = serialized.get("state_dict")
        if state_dict is not None and kwargs.get("load_state_dict", True):
            properties["state_dict"] = state_dict
        return cls(**properties)


def parse(key_str: str) -> Type[Encoder]:
    """Parse a type-name key into an encoder type
    (reference: encoders.py:354-359)."""
    return {
        t.__name__: t for t in (SpatialConvEncoder, PyramidConvEncoder)
    }[key_str]


def key(enc: Encoder) -> str:
    """Return the type key for the encoder (reference: encoders.py:362-364)."""
    return type(enc).__name__


KIND_SPATIAL = "spatial"
KIND_PYRAMID = "pyramid"


def encoder(kind: str = KIND_PYRAMID, **kwargs: Any) -> Encoder:
    """Create an encoder by kind or exact type name
    (reference: encoders.py:371-391)."""
    encoder_t: Type[Encoder]
    if kind == KIND_SPATIAL:
        encoder_t = SpatialConvEncoder
    elif kind == KIND_PYRAMID:
        encoder_t = PyramidConvEncoder
    else:
        encoder_t = parse(kind)
    return encoder_t(**kwargs)
