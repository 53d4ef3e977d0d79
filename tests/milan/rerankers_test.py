"""CLIP reranker tests: attention parity, mask editing, BPE, reranking.

The attention parity replica mirrors the reference's hookable MHA
(reference: src/milan/rerankers.py:36-100) so the mask-editing insertion
point is pinned against torch numerics.
"""
import gzip
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.models import clip as clip_model
from neuron_descriptions_tpu.milan import rerankers

torch = pytest.importorskip("torch")

TINY = dict(
    image_resolution=16,
    patch_size=8,
    vision_width=16,
    vision_layers=2,
    vision_heads=2,
    embed_dim=8,
    context_length=12,
    vocab_size=64,
    transformer_width=8,
    transformer_heads=2,
    transformer_layers=2,
)


@pytest.fixture(scope="module")
def tiny_params():
    return clip_model.init(jax.random.PRNGKey(0), config=TINY)


def test_attention_parity_with_torch_mha(rng, tiny_params):
    """Our fused attention == the reference's CLIPHookableMultiheadAttention
    (qkv proj -> scaled bmm -> softmax -> bmm -> out proj)."""
    width, heads = TINY["vision_width"], TINY["vision_heads"]
    prefix = "visual.transformer.resblocks.0"
    x = rng.normal(size=(2, 5, width)).astype(np.float32)

    ours = np.asarray(clip_model._attention(tiny_params, prefix,
                                            jnp.asarray(x), heads))

    qkv_w = torch.from_numpy(np.asarray(
        tiny_params[f"{prefix}.attn.in_proj_weight"]))
    qkv_b = torch.from_numpy(np.asarray(
        tiny_params[f"{prefix}.attn.in_proj_bias"]))
    out_w = torch.from_numpy(np.asarray(
        tiny_params[f"{prefix}.attn.out_proj.weight"]))
    out_b = torch.from_numpy(np.asarray(
        tiny_params[f"{prefix}.attn.out_proj.bias"]))

    # Reference shape convention: (num_tokens, batch, hidden).
    hiddens = torch.from_numpy(x).permute(1, 0, 2)
    num_tokens, batch, hidden = hiddens.shape
    head_size = hidden // heads
    queries, keys, values = (hiddens @ qkv_w.t() + qkv_b).chunk(3, dim=-1)
    queries = queries.contiguous().view(
        num_tokens, batch * heads, head_size).transpose(0, 1)
    keys = keys.contiguous().view(
        num_tokens, batch * heads, head_size).transpose(0, 1)
    values = values.contiguous().view(
        num_tokens, batch * heads, head_size).transpose(0, 1)
    queries = queries / math.sqrt(queries.shape[-1])
    attn = torch.softmax(torch.bmm(queries, keys.transpose(-2, -1)), -1)
    output = torch.bmm(attn, values).transpose(0, 1).contiguous().view(
        num_tokens, batch, hidden)
    expected = (output @ out_w.t() + out_b).permute(1, 0, 2).numpy()

    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_cls_mask_edits_reference_rule(rng, tiny_params):
    """The mask multiplies ONLY the CLS query's post-softmax weights over
    patch keys (reference rule: rerankers.py:202-213); a mask of ones is a
    no-op, and a changed mask changes the CLS row only."""
    width, heads = TINY["vision_width"], TINY["vision_heads"]
    prefix = "visual.transformer.resblocks.0"
    x = jnp.asarray(rng.normal(size=(1, 5, width)).astype(np.float32))

    base = np.asarray(clip_model._attention(tiny_params, prefix, x, heads))
    ones = np.asarray(clip_model._attention(
        tiny_params, prefix, x, heads,
        cls_mask=jnp.ones((1, 4))))
    np.testing.assert_allclose(base, ones, atol=1e-6)

    halved = np.asarray(clip_model._attention(
        tiny_params, prefix, x, heads,
        cls_mask=jnp.full((1, 4), 0.5)))
    # Only the CLS token's output changes.
    assert not np.allclose(halved[:, 0], base[:, 0])
    np.testing.assert_allclose(halved[:, 1:], base[:, 1:], atol=1e-6)


def test_encode_image_and_text_shapes(rng, tiny_params):
    images = jnp.asarray(rng.normal(size=(2, 3, 16, 16)).astype(np.float32))
    features = clip_model.encode_image(tiny_params, images, config=TINY)
    assert features.shape == (2, TINY["embed_dim"])

    masked = clip_model.encode_image(
        tiny_params, images, cls_mask=jnp.zeros((2, 4)), config=TINY)
    assert not np.allclose(np.asarray(masked), np.asarray(features))

    tokens = jnp.asarray([[1, 5, 9, 0, 0], [1, 3, 2, 9, 0]])
    text = clip_model.encode_text(tiny_params, tokens, config=TINY)
    assert text.shape == (2, TINY["embed_dim"])


@pytest.fixture(scope="module")
def bpe_tokenizer(tmp_path_factory):
    """A tiny BPE merges file exercising the real merge algorithm."""
    merges = "\n".join([
        "#version: 0.2",
        "l o",
        "lo w</w>",
        "e r</w>",
        "lo w",
    ])
    path = tmp_path_factory.mktemp("bpe") / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as handle:
        handle.write(merges + "\n" + "\n".join(
            "x y" for _ in range(10)))
    return clip_model.Tokenizer(bpe_path=path, context_length=8)


def test_bpe_merges(bpe_tokenizer):
    # "low" -> l+o merge, then lo+w</w> merge -> one token.
    tokens = bpe_tokenizer.encode("low")
    assert len(tokens) == 1
    assert bpe_tokenizer.encoder["low</w>"] == tokens[0]
    # "lower" -> "low" + "er</w>".
    tokens = bpe_tokenizer.encode("lower")
    assert len(tokens) == 2
    assert tokens[1] == bpe_tokenizer.encoder["er</w>"]


def test_tokenize_padding_and_truncation(bpe_tokenizer):
    out = bpe_tokenizer(["low", "a b c d e f g h i j"])
    assert out.shape == (2, 8)
    sot = bpe_tokenizer.encoder["<|startoftext|>"]
    eot = bpe_tokenizer.encoder["<|endoftext|>"]
    assert out[0, 0] == sot and out[0, 2] == eot and out[0, -1] == 0
    assert out[1, -1] == eot  # truncated rows still end with eot


@pytest.fixture(scope="module")
def clip_with_masks(bpe_tokenizer, tiny_params):
    model = rerankers.CLIPWithMasks(tokenize=bpe_tokenizer)
    # Swap in the tiny tower to keep the test light.
    model.config = TINY
    model.params = tiny_params
    model.mask_layers = tuple(range(TINY["vision_layers"]))
    model._jit_image = jax.jit(
        lambda p, im, m: clip_model.encode_image(
            p, im, cls_mask=m, mask_layers=model.mask_layers, config=TINY))
    model._jit_image_nomask = jax.jit(
        lambda p, im: clip_model.encode_image(p, im, config=TINY))
    model._jit_text = jax.jit(
        lambda p, t: clip_model.encode_text(p, t, config=TINY))
    return model


def test_clip_with_masks_similarities(rng, clip_with_masks):
    images = rng.random((3, 3, 16, 16)).astype(np.float32)
    sims = np.asarray(clip_with_masks(images, ["low", "lower"],
                                      resize=False))
    assert sims.shape == (3, 2)
    assert np.all(np.abs(sims) <= 1.0 + 1e-5)

    masks = (rng.random((3, 1, 16, 16)) > 0.5).astype(np.float32)
    masked = np.asarray(clip_with_masks(images, ["low", "lower"],
                                        masks=masks, resize=False))
    assert not np.allclose(masked, sims)


def test_reranker_sorts_descending(rng, clip_with_masks):
    model = rerankers.CLIPWithMasksReranker(clip_with_masks, lam=0.5)
    images = rng.random((2, 4, 3, 16, 16)).astype(np.float32)
    masks = (rng.random((2, 4, 1, 16, 16)) > 0.5).astype(np.float32)
    texts = (("low", "lower", "er low"), ("low low", "er", "lower low"))
    out = model(images, masks, texts)
    assert len(out.texts) == 2
    for row in range(2):
        assert list(out.scores[row]) == sorted(out.scores[row],
                                               reverse=True)
        assert set(out.orders[row]) == {0, 1, 2}
        assert out.texts[row][0] == texts[row][out.orders[row][0]]


def test_reranker_validates_batch_sizes(rng, clip_with_masks):
    model = rerankers.CLIPWithMasksReranker(clip_with_masks)
    images = rng.random((2, 4, 3, 16, 16)).astype(np.float32)
    masks = np.ones((1, 4, 1, 16, 16), np.float32)
    with pytest.raises(ValueError):
        model(images, masks, (("a",), ("b",)))


def test_decoder_with_clip_predict(rng, clip_with_masks, bpe_tokenizer):
    """Review finding: +clip decoders must be usable through predict()
    (raw images/masks reach CLIP, not precomputed features)."""
    import numpy as np
    from neuron_descriptions_tpu.milan import decoders as decoders_lib
    from neuron_descriptions_tpu.utils import lang
    from tests.milan.conftest import FakeEncoder

    tok = lang.tokenizer(lemmatize=False, ignore_stop=False,
                         ignore_punct=False)
    indexer = lang.indexer(["low lower", "er low", "low er lower"],
                           tokenize=tok, start=True, stop=True, pad=True,
                           unk=True)
    model = rerankers.DecoderWithCLIP(
        indexer, FakeEncoder(), embedding_size=8, hidden_size=16,
        length=4, beam_size=3,
        reranker_kwargs={"params": {}, "tokenize": bpe_tokenizer})
    # Swap in the tiny CLIP tower.
    model.reranker = rerankers.CLIPWithMasksReranker(clip_with_masks,
                                                     lam=1.0)

    class DS:
        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return ("layer0", i, r.random((2, 3, 16, 16)).astype(np.float32),
                    np.ones((2, 1, 16, 16), np.float32), ("low",))

        def __len__(self):
            return 3

    captions = model.predict(DS(), batch_size=2)
    assert len(captions) == 3
    assert all(isinstance(c, str) for c in captions)
