"""Tests for the pretrained-MILAN hub and its payload load chain."""
import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu import milan
from neuron_descriptions_tpu.milan import decoders, lms
from neuron_descriptions_tpu.milan import loaders as milan_loaders
from neuron_descriptions_tpu.utils import env

from tests.milan.conftest import FakeEncoder

torch = pytest.importorskip("torch")


def test_hub_covers_groupings_with_clip_variants():
    hub = milan_loaders.hub()
    plain = [key for key in hub.configs if not key.endswith("+clip")]
    clip = [key for key in hub.configs if key.endswith("+clip")]
    assert len(plain) == len(clip)
    for key in ("base", "cls", "gen", "imagenet", "places365", "alexnet",
                "resnet152", "biggan"):
        assert key in hub.configs, key
        assert f"{key}+clip" in hub.configs, key
    # The reference's 'NOT_' skip never matches its lowercase 'not-' keys
    # (reference: loaders.py:13-14 vs milannotations/loaders.py:82-87), so
    # the leave-one-out configs ARE in the hub; we match that behavior.
    assert "not-alexnet-imagenet" in hub.configs
    for config in hub.configs.values():
        assert config.requires_path and not config.load_weights
        assert config.url.startswith("http://milan.csail.mit.edu/models/")


def test_pretrained_loads_torch_payload(tmp_path, monkeypatch, indexer):
    """End-to-end: a torch-format payload at <models_dir>/base.pth loads
    through milan.pretrained('base') — the exact chain the published
    checkpoints take (reference: loaders.py:28-32 -> serialize.py:255-269).
    """
    monkeypatch.setenv(env.ENV_MODELS_DIR, str(tmp_path))

    donor_lm = lms.LanguageModel(indexer, embedding_size=8, hidden_size=16,
                                 layers=2)
    donor = decoders.Decoder(indexer, FakeEncoder(), lm=donor_lm,
                             embedding_size=8, hidden_size=16, length=6,
                             beam_size=4, strategy="rerank")

    payload = donor.serialize()
    # Write it the way the reference does: torch.save with tensor leaves.
    def to_torch(obj):
        if isinstance(obj, np.ndarray):
            return torch.from_numpy(obj.copy())
        if isinstance(obj, dict):
            return {key: to_torch(value) for key, value in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_torch(v) for v in obj)
        return obj

    torch.save(to_torch(dict(payload)), tmp_path / "base.pth")

    from neuron_descriptions_tpu.milan import encoders as encoders_lib
    original = encoders_lib.parse
    encoders_lib.parse = lambda key: FakeEncoder
    try:
        rebuilt = milan.pretrained("base")
    finally:
        encoders_lib.parse = original

    assert isinstance(rebuilt, decoders.Decoder)
    assert rebuilt.strategy == "rerank"
    features = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 16)).astype(np.float32))
    out_a = donor(features, strategy="beam", mi=False)
    out_b = rebuilt(features, strategy="beam", mi=False)
    assert out_a.captions == out_b.captions
    np.testing.assert_allclose(np.asarray(out_a.scores),
                               np.asarray(out_b.scores), atol=1e-5)


def test_pretrained_unknown_key():
    with pytest.raises(KeyError):
        milan.pretrained("not-a-grouping")


def test_pretrained_full_chain_with_pyramid_encoder(tmp_path, monkeypatch,
                                                    indexer, rng):
    """The complete published-checkpoint chain with a REAL
    PyramidConvEncoder: torch-format payload with the reference's exact
    key nesting (state_dict holds encoder.encoder.model.<torchvision key>
    + encoder.mean/std — reference: encoders.py:274 + nethook) loads via
    pretrained() and reproduces the donor's captions bit-for-bit."""
    from neuron_descriptions_tpu.milan import encoders

    monkeypatch.setenv(env.ENV_MODELS_DIR, str(tmp_path))

    encoder = encoders.PyramidConvEncoder(config="resnet18", seed=3)
    donor_lm = lms.LanguageModel(indexer, embedding_size=8, hidden_size=16,
                                 layers=2)
    donor = decoders.Decoder(indexer, encoder, lm=donor_lm,
                             embedding_size=8, hidden_size=16, length=6,
                             beam_size=4, strategy="rerank")

    state = donor.state_dict()
    assert "encoder.encoder.model.conv1.weight" in state
    assert "encoder.mean" in state
    assert "lm.lstm.weight_ih_l0" in state
    assert "lstm.weight_ih" in state  # LSTMCell (no _l0 suffix)

    payload = donor.serialize()

    def to_torch(obj):
        if isinstance(obj, np.ndarray):
            return torch.from_numpy(obj.copy())
        if isinstance(obj, dict):
            return {key: to_torch(value) for key, value in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_torch(v) for v in obj)
        return obj

    torch.save(to_torch(dict(payload)), tmp_path / "cls.pth")
    rebuilt = milan.pretrained("cls")

    images = rng.random((2, 3, 3, 32, 32)).astype(np.float32)
    masks = (rng.random((2, 3, 1, 32, 32)) > 0.5).astype(np.float32)
    out_a = donor(jnp.asarray(images), masks=jnp.asarray(masks),
                  strategy="beam", mi=False)
    out_b = rebuilt(jnp.asarray(images), masks=jnp.asarray(masks),
                    strategy="beam", mi=False)
    assert out_a.captions == out_b.captions
    np.testing.assert_allclose(np.asarray(out_a.scores),
                               np.asarray(out_b.scores), atol=1e-5)
