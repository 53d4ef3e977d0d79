"""CLIP (ViT-B/32) as pure JAX functions, with CLS-attention mask editing.

Port of the parts of OpenAI CLIP that MILAN's ``+clip`` reranker needs
(reference: src/milan/rerankers.py wraps the ``clip`` package): the ViT
visual tower, the causal text transformer, and the byte-level BPE
tokenizer. Parameters are a flat dict keyed exactly like the torch
``state_dict()`` of ``clip.load('ViT-B/32')`` so published weights import
mechanically.

The reranker needs to EDIT attention: when computing the CLS token, the
attention weights over patch keys are multiplied (post-softmax, no
renormalization) by the downsampled activation mask (reference:
rerankers.py:202-218). The visual ``apply`` takes an optional
``cls_mask (B, num_patches)`` plus the set of layers to edit, and applies
that rule inside the fused attention — functionally, instead of hooking a
softmax module.
"""
import functools
import gzip
import html
import pathlib
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu.utils import env, hubs
from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = [
    "VITB32",
    "IMAGE_MEAN",
    "IMAGE_STD",
    "encode_image",
    "encode_text",
    "init",
    "Tokenizer",
    "tokenizer",
]

Params = Dict[str, Array]

# ViT-B/32 configuration (openai CLIP).
VITB32 = dict(
    image_resolution=224,
    patch_size=32,
    vision_width=768,
    vision_layers=12,
    vision_heads=12,
    embed_dim=512,
    context_length=77,
    vocab_size=49408,
    transformer_width=512,
    transformer_heads=8,
    transformer_layers=12,
)

IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

BPE_URL = ("https://github.com/openai/CLIP/raw/main/clip/"
           "bpe_simple_vocab_16e6.txt.gz")
BPE_FILE_NAME = "bpe_simple_vocab_16e6.txt.gz"


def _layer_norm(x: Array, weight: Array, bias: Array,
                eps: float = 1e-5) -> Array:
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


def _quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(params: Params, prefix: str, x: Array, heads: int,
               causal: bool = False,
               cls_mask: Optional[Array] = None) -> Array:
    """Multi-head self-attention with optional CLS-row mask editing.

    Args:
        x: (B, T, D) tokens (batch-first; the torch reference is
            tokens-first, numerics identical).
        cls_mask: Optional (B, T-1) multiplier applied to the CLS query's
            post-softmax attention over the non-CLS keys (reference
            rule: rerankers.py:202-213).
    """
    batch, tokens, dim = x.shape
    head_dim = dim // heads
    qkv = x @ params[f"{prefix}.attn.in_proj_weight"].T + \
        params[f"{prefix}.attn.in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t: Array) -> Array:
        return t.reshape(batch, tokens, heads, head_dim).transpose(
            0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scores = (q / jnp.sqrt(head_dim).astype(q.dtype)) @ k.transpose(
        0, 1, 3, 2)
    if causal:
        causal_bias = jnp.triu(
            jnp.full((tokens, tokens), -jnp.inf, scores.dtype), k=1)
        scores = scores + causal_bias
    probs = jax.nn.softmax(scores, axis=-1)

    if cls_mask is not None:
        edited = probs[:, :, 0, 1:] * cls_mask[:, None, :]
        probs = probs.at[:, :, 0, 1:].set(edited)

    out = (probs @ v).transpose(0, 2, 1, 3).reshape(batch, tokens, dim)
    return out @ params[f"{prefix}.attn.out_proj.weight"].T + \
        params[f"{prefix}.attn.out_proj.bias"]


def _block(params: Params, prefix: str, x: Array, heads: int,
           causal: bool = False, cls_mask: Optional[Array] = None) -> Array:
    h = _layer_norm(x, params[f"{prefix}.ln_1.weight"],
                    params[f"{prefix}.ln_1.bias"])
    x = x + _attention(params, prefix, h, heads, causal=causal,
                       cls_mask=cls_mask)
    h = _layer_norm(x, params[f"{prefix}.ln_2.weight"],
                    params[f"{prefix}.ln_2.bias"])
    h = _quick_gelu(h @ params[f"{prefix}.mlp.c_fc.weight"].T +
                    params[f"{prefix}.mlp.c_fc.bias"])
    h = h @ params[f"{prefix}.mlp.c_proj.weight"].T + \
        params[f"{prefix}.mlp.c_proj.bias"]
    return x + h


def encode_image(params: Params, images: Array,
                 cls_mask: Optional[Array] = None,
                 mask_layers: Optional[Sequence[int]] = None,
                 config: dict = VITB32) -> Array:
    """CLIP visual tower → (B, embed_dim) image features.

    Args:
        images: (B, 3, H, W), already CLIP-normalized.
        cls_mask: Optional (B, num_patches) CLS-attention multiplier.
        mask_layers: Blocks to edit; defaults to all
            (reference: rerankers.py:144-149).
    """
    width, heads = config["vision_width"], config["vision_heads"]
    patch = config["patch_size"]
    layers = config["vision_layers"]
    if mask_layers is None:
        mask_layers = tuple(range(layers))

    h = jax.lax.conv_general_dilated(
        images, params["visual.conv1.weight"], (patch, patch), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    batch = h.shape[0]
    h = h.reshape(batch, width, -1).transpose(0, 2, 1)  # (B, P, width)
    cls = params["visual.class_embedding"].astype(h.dtype)
    cls = jnp.broadcast_to(cls, (batch, 1, width))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["visual.positional_embedding"]
    h = _layer_norm(h, params["visual.ln_pre.weight"],
                    params["visual.ln_pre.bias"])

    for layer in range(layers):
        mask = cls_mask if (cls_mask is not None and
                            layer in mask_layers) else None
        h = _block(params, f"visual.transformer.resblocks.{layer}", h,
                   heads, cls_mask=mask)

    h = _layer_norm(h[:, 0], params["visual.ln_post.weight"],
                    params["visual.ln_post.bias"])
    return h @ params["visual.proj"]


def encode_text(params: Params, tokens: Array,
                config: dict = VITB32) -> Array:
    """CLIP text tower → (B, embed_dim) text features.

    Args:
        tokens: (B, context_length) int32 BPE token ids.
    """
    heads = config["transformer_heads"]
    layers = config["transformer_layers"]

    h = params["token_embedding.weight"][tokens]
    h = h + params["positional_embedding"][:tokens.shape[1]]
    for layer in range(layers):
        h = _block(params, f"transformer.resblocks.{layer}", h, heads,
                   causal=True)
    h = _layer_norm(h, params["ln_final.weight"], params["ln_final.bias"])
    # Features at the EOT token (the highest token id in each row).
    eot = jnp.argmax(tokens, axis=-1)
    h = h[jnp.arange(h.shape[0]), eot]
    return h @ params["text_projection"]


def init(key: PRNGKey, config: dict = VITB32) -> Params:
    """Random-init parameters with openai CLIP's names/shapes."""
    params: Params = {}
    keys = iter(jax.random.split(key, 512))

    def normal(shape, scale=0.02):
        return jax.random.normal(next(keys), shape) * scale

    def block(prefix: str, width: int) -> None:
        params[f"{prefix}.ln_1.weight"] = jnp.ones((width,))
        params[f"{prefix}.ln_1.bias"] = jnp.zeros((width,))
        params[f"{prefix}.attn.in_proj_weight"] = normal((3 * width, width))
        params[f"{prefix}.attn.in_proj_bias"] = jnp.zeros((3 * width,))
        params[f"{prefix}.attn.out_proj.weight"] = normal((width, width))
        params[f"{prefix}.attn.out_proj.bias"] = jnp.zeros((width,))
        params[f"{prefix}.ln_2.weight"] = jnp.ones((width,))
        params[f"{prefix}.ln_2.bias"] = jnp.zeros((width,))
        params[f"{prefix}.mlp.c_fc.weight"] = normal((4 * width, width))
        params[f"{prefix}.mlp.c_fc.bias"] = jnp.zeros((4 * width,))
        params[f"{prefix}.mlp.c_proj.weight"] = normal((width, 4 * width))
        params[f"{prefix}.mlp.c_proj.bias"] = jnp.zeros((width,))

    vw = config["vision_width"]
    grid = config["image_resolution"] // config["patch_size"]
    params["visual.conv1.weight"] = normal(
        (vw, 3, config["patch_size"], config["patch_size"]))
    params["visual.class_embedding"] = normal((vw,))
    params["visual.positional_embedding"] = normal((grid * grid + 1, vw))
    params["visual.ln_pre.weight"] = jnp.ones((vw,))
    params["visual.ln_pre.bias"] = jnp.zeros((vw,))
    for layer in range(config["vision_layers"]):
        block(f"visual.transformer.resblocks.{layer}", vw)
    params["visual.ln_post.weight"] = jnp.ones((vw,))
    params["visual.ln_post.bias"] = jnp.zeros((vw,))
    params["visual.proj"] = normal((vw, config["embed_dim"]))

    tw = config["transformer_width"]
    params["token_embedding.weight"] = normal((config["vocab_size"], tw))
    params["positional_embedding"] = normal((config["context_length"], tw))
    for layer in range(config["transformer_layers"]):
        block(f"transformer.resblocks.{layer}", tw)
    params["ln_final.weight"] = jnp.ones((tw,))
    params["ln_final.bias"] = jnp.zeros((tw,))
    params["text_projection"] = normal((tw, config["embed_dim"]))
    params["logit_scale"] = jnp.zeros(())
    return params


# ---------------------------------------------------------------------------
# Byte-level BPE tokenizer (CLIP's SimpleTokenizer semantics).
# ---------------------------------------------------------------------------
@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """The GPT-2 reversible byte ↔ unicode mapping."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("¡"), ord("¬") + 1)) +
          list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class Tokenizer:
    """CLIP's byte-level BPE tokenizer.

    Needs the public merges file (``bpe_simple_vocab_16e6.txt.gz``); it is
    resolved from ``<models_dir>/clip-bpe_simple_vocab_16e6.txt.gz`` and
    downloaded from the OpenAI repo when missing.
    """

    def __init__(self, bpe_path: Optional[pathlib.Path] = None,
                 context_length: int = 77):
        if bpe_path is None:
            bpe_path = env.models_dir() / f"clip-{BPE_FILE_NAME}"
            if not bpe_path.exists():
                hubs.download_file(BPE_URL, bpe_path)
        self.context_length = context_length

        self.byte_encoder = _bytes_to_unicode()
        with gzip.open(bpe_path, "rt", encoding="utf-8") as handle:
            merges = handle.read().split("\n")[1:48895]
        merges = [tuple(merge.split()) for merge in merges]

        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(merge) for merge in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {token: index for index, token in enumerate(vocab)}
        self.bpe_ranks = {merge: index for index, merge in enumerate(merges)}
        self.cache: Dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        # CLIP's pattern uses \p{L}/\p{N} via the regex package; the stdlib
        # ASCII classes are equivalent for the English caption corpus.
        self.pattern = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            bigram = min(
                pairs,
                key=lambda pair: self.bpe_ranks.get(pair, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1 and
                        word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)

        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        for chunk in re.findall(self.pattern, _clean_text(text)):
            chunk = "".join(self.byte_encoder[b]
                            for b in chunk.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self._bpe(chunk).split(
                " "))
        return tokens

    def __call__(self, texts) -> np.ndarray:
        """Tokenize one or many texts to (n, context_length) int32 ids,
        truncating like ``clip.tokenize(truncate=True)``."""
        if isinstance(texts, str):
            texts = [texts]
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for row, text in enumerate(texts):
            tokens = [sot] + self.encode(text) + [eot]
            if len(tokens) > self.context_length:
                tokens = tokens[:self.context_length]
                tokens[-1] = eot
            out[row, :len(tokens)] = tokens
        return out


def tokenizer(**kwargs) -> Tokenizer:
    """Create the BPE tokenizer (downloads merges file if absent)."""
    return Tokenizer(**kwargs)
