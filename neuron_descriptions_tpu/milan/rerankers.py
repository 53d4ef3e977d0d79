"""CLIP-based reranking of MILAN descriptions
(reference: src/milan/rerankers.py).

The ``+clip`` MILAN variants sample a wide beam from the base decoder and
rerank it with CLIP, scoring each candidate against every top image twice —
once with the activation mask multiplied into the CLS token's attention
weights at each visual block, once unmasked — and combining
``(1-λ)·sim_masked + λ·sim_unmasked`` summed over the k images
(reference: rerankers.py:13-21,261-330).

TPU design: CLIP is the pure-function tower in ``models/clip.py``; the mask
editing happens inside the fused attention instead of hooking a softmax
module, and one jitted call scores a whole (images × masked/unmasked ×
texts) batch.
"""
from typing import Any, Mapping, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu.data import renormalize
from neuron_descriptions_tpu.milan import decoders, encoders
from neuron_descriptions_tpu.models import clip as clip_model
from neuron_descriptions_tpu.models.vit import _resize_bicubic
from neuron_descriptions_tpu.utils import hubs, serialize
from neuron_descriptions_tpu.utils.typing import Array, StrSequence

__all__ = [
    "CLIPWithMasks",
    "CLIPWithMasksReranker",
    "RerankerOutput",
    "reranker",
    "DecoderWithCLIP",
]

CLIP_VITB32_URL = ("https://openaipublic.azureedge.net/clip/models/"
                   "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58"
                   "eba950af/ViT-B-32.pt")


class CLIPWithMasks:
    """CLIP that can mask the CLS token's attention
    (reference: rerankers.py:103-250)."""

    def __init__(self,
                 mask_layers: Optional[Sequence[int]] = None,
                 source_mean: Optional[Sequence[float]] = None,
                 source_std: Optional[Sequence[float]] = None,
                 name: str = "ViT-B/32",
                 params: Optional[Mapping[str, np.ndarray]] = None,
                 path: Optional[Any] = None,
                 tokenize: Optional[clip_model.Tokenizer] = None,
                 seed: int = 0,
                 **_: Any):
        if name != "ViT-B/32":
            raise ValueError(f"CLIP model not supported: {name}")
        if (source_mean is None) != (source_std is None):
            raise ValueError("set neither or both of source_mean/source_std")
        self.name = name
        self.config = clip_model.VITB32

        if params is None and path is not None:
            from neuron_descriptions_tpu.models import torch_import
            params = torch_import.load_state_dict(path)
        if params is not None:
            self.params = {key: jnp.asarray(value)
                           for key, value in params.items()
                           if not key.endswith("num_batches_tracked")}
        else:
            self.params = clip_model.init(jax.random.PRNGKey(seed))

        if source_mean is None or source_std is None:
            source_mean, source_std = renormalize.OFFSET_SCALE["pt"]
        self.renormalizer = renormalize.Renormalizer(
            (source_mean, source_std),
            (clip_model.IMAGE_MEAN, clip_model.IMAGE_STD))

        layers = self.config["vision_layers"]
        self.mask_layers = (tuple(range(layers)) if mask_layers is None
                            else tuple(mask_layers))
        self.tokenize = tokenize
        self._jit_image = jax.jit(
            lambda p, im, m: clip_model.encode_image(
                p, im, cls_mask=m, mask_layers=self.mask_layers,
                config=self.config))
        self._jit_image_nomask = jax.jit(
            lambda p, im: clip_model.encode_image(p, im,
                                                  config=self.config))
        self._jit_text = jax.jit(
            lambda p, t: clip_model.encode_text(p, t, config=self.config))

    @property
    def input_resolution(self) -> int:
        return self.config["image_resolution"]

    @property
    def num_patches_xy(self) -> int:
        return self.input_resolution // self.config["patch_size"]

    @property
    def num_patches(self) -> int:
        return self.num_patches_xy ** 2

    def __call__(self,
                 images: Array,
                 texts: StrSequence,
                 masks: Optional[Array] = None,
                 resize: bool = True,
                 renormalize_images: bool = True) -> Array:
        """Cosine similarity between images and texts → (B, len(texts))
        (reference: rerankers.py:151-229)."""
        if self.tokenize is None:
            self.tokenize = clip_model.tokenizer()

        images = jnp.asarray(images, jnp.float32)
        if resize:
            images = _resize_bicubic(images, self.input_resolution,
                                     self.input_resolution)
        if renormalize_images:
            images = jnp.asarray(self.renormalizer(images))

        cls_mask = None
        if masks is not None:
            masks = jnp.asarray(masks, jnp.float32)
            size = self.num_patches_xy
            cls_mask = encoders.resize_bilinear(masks, size, size).reshape(
                masks.shape[0], self.num_patches)

        tokens = jnp.asarray(self.tokenize(list(texts)))
        if cls_mask is not None:
            images_encoded = self._jit_image(self.params, images, cls_mask)
        else:
            images_encoded = self._jit_image_nomask(self.params, images)
        images_encoded = images_encoded / jnp.linalg.norm(
            images_encoded, axis=-1, keepdims=True)

        texts_encoded = self._jit_text(self.params, tokens)
        texts_encoded = texts_encoded / jnp.linalg.norm(
            texts_encoded, axis=-1, keepdims=True)

        return images_encoded @ texts_encoded.T

    forward = __call__


class RerankerOutput(NamedTuple):
    """Output of a reranking pass (reference: rerankers.py:253-258)."""

    texts: Sequence[StrSequence]
    orders: Sequence[Sequence[int]]
    scores: Sequence[Sequence[float]]


class CLIPWithMasksReranker:
    """Rerank candidate captions with masked+unmasked CLIP scores
    (reference: rerankers.py:261-330)."""

    def __init__(self, clip_with_masks: CLIPWithMasks, lam: float = 0.5):
        self.clip_with_masks = clip_with_masks
        self.lam = lam

    def __call__(self,
                 images: Array,
                 masks: Array,
                 texts: Sequence[StrSequence],
                 lam: Optional[float] = None) -> RerankerOutput:
        if len(images) != len(masks):
            raise ValueError("images and masks batch sizes do not align: "
                             f"{len(images)} vs. {len(masks)}")
        if len(images) != len(texts):
            raise ValueError("images and texts batch sizes do not align: "
                             f"{len(images)} vs. {len(texts)}")
        if lam is None:
            lam = self.lam

        rerankeds, orders, scores = [], [], []
        for b_images, b_masks, b_texts in zip(images, masks, texts):
            sim_masked = np.asarray(
                self.clip_with_masks(b_images, b_texts,
                                     masks=b_masks)).sum(axis=0)
            sim_unmasked = np.asarray(
                self.clip_with_masks(b_images, b_texts)).sum(axis=0)
            sim = (1.0 - lam) * sim_masked + lam * sim_unmasked

            indices = np.argsort(-sim)
            rerankeds.append(tuple(b_texts[index] for index in indices))
            orders.append(tuple(int(index) for index in indices))
            scores.append(tuple(float(sim[index]) for index in indices))

        return RerankerOutput(tuple(rerankeds), tuple(orders),
                              tuple(scores))

    forward = __call__


def reranker(lam: float = 1.0, **kwargs: Any) -> CLIPWithMasksReranker:
    """Create a CLIPWithMasksReranker (reference: rerankers.py:333-339)."""
    return CLIPWithMasksReranker(CLIPWithMasks(**kwargs), lam=lam)


class DecoderWithCLIP(decoders.Decoder):
    """Decoder that reranks its final beam with CLIP
    (reference: src/milan/decoders.py:1115-1211)."""

    def __init__(self, *args: Any,
                 reranker_kwargs: Optional[Mapping[str, Any]] = None,
                 **kwargs: Any):
        kwargs.setdefault("strategy", decoders.STRATEGY_BEAM)
        kwargs.setdefault("beam_size", 1000)
        kwargs.setdefault("temperature", 0.5)
        super().__init__(*args, **kwargs)

        self.reranker_kwargs = dict(reranker_kwargs) if reranker_kwargs \
            else {}
        self.reranker_kwargs.setdefault("name", "ViT-B/32")
        kwargs_for_reranker = dict(self.reranker_kwargs)
        clip_path = kwargs_for_reranker.pop("path", None)
        if clip_path is None and "params" not in kwargs_for_reranker:
            from neuron_descriptions_tpu.utils import env
            clip_path = env.models_dir() / "clip-vit-b-32.pth"
            if not clip_path.exists():
                # Fail loudly rather than silently reranking with random
                # CLIP weights (review finding).
                hubs.download_file(CLIP_VITB32_URL, clip_path)
        self.reranker = reranker(path=clip_path, **kwargs_for_reranker)

    def forward(self,  # type: ignore[override]
                images_or_features: Array,
                masks: Optional[Array] = None,
                lam: Optional[float] = None,
                **kwargs: Any) -> decoders.DecoderOutput:
        """Beam-decode then rerank with CLIP
        (reference: decoders.py:1134-1198)."""
        if masks is None:
            raise ValueError("must specify masks in DecoderWithCLIP")
        if "strategy" in kwargs:
            raise ValueError('cannot set "strategy" in DecoderWithCLIP')

        images = jnp.asarray(images_or_features)
        outputs = super().forward(images, masks=jnp.asarray(masks),
                                  strategy=decoders.STRATEGY_BEAM, **kwargs)

        beam_captions = outputs.beam_captions
        beam_scores = np.asarray(outputs.beam_scores)
        beam_tokens = np.asarray(outputs.beam_tokens)
        assert beam_captions is not None

        rerankeds = self.reranker(images, jnp.asarray(masks), beam_captions,
                                  lam=lam)

        captions = tuple(reranked[0] for reranked in rerankeds.texts)
        scores = jnp.asarray([
            beam_scores[position, order[0]]
            for position, order in enumerate(rerankeds.orders)
        ])
        tokens = jnp.asarray(np.stack([
            beam_tokens[position, order[0]]
            for position, order in enumerate(rerankeds.orders)
        ]))

        return decoders.DecoderOutput(captions, scores, tokens,
                                      *outputs[3:])

    def predict(self,  # type: ignore[override]
                dataset: Any,
                image_index: int = 2,
                mask_index: int = 3,
                batch_size: int = 16,
                display_progress_as: Any = None,
                **kwargs: Any) -> Any:
        """Caption every sample, keeping raw images intact for CLIP.

        ``Decoder.predict`` pre-encodes images into features, but the CLIP
        reranker must see the raw images and masks (reference:
        decoders.py:1141-1149), so this override batches them through
        ``forward`` directly.
        """
        del display_progress_as
        captions = []
        for start in range(0, len(dataset), batch_size):
            stop = min(start + batch_size, len(dataset))
            samples = [dataset[i] for i in range(start, stop)]
            images = np.stack([np.asarray(s[image_index]) for s in samples])
            masks = np.stack([np.asarray(s[mask_index]) for s in samples])
            outputs = self(jnp.asarray(images), masks=jnp.asarray(masks),
                           **kwargs)
            captions.extend(outputs.captions)
        return tuple(captions)

    def properties(self) -> serialize.Properties:
        return {
            **super().properties(),
            "reranker_kwargs": self.reranker_kwargs,
        }

    @classmethod
    def from_decoder(cls, decoder: decoders.Decoder) -> "DecoderWithCLIP":
        """Convert a base Decoder to a DecoderWithCLIP
        (reference: decoders.py:1207-1211)."""
        return cls.deserialize(decoder.serialize())
