"""Decoder tests: torch step parity, strategies, fit, payload round trip.

The parity replica reimplements the reference decoder topology in torch
(reference: src/milan/decoders.py:304-323,576-634) and loads OUR params
into it — verifying both the state-dict key contract and the numerics of
attend → gate → LSTM step → log-softmax (and the PMI variant).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu.milan import decoders, lms
from neuron_descriptions_tpu.utils import serialize

from tests.milan.conftest import FEATURE_SIZE, FakeEncoder

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

HIDDEN = 16
EMBED = 8
LENGTH = 6


class TorchDecoderCore(tnn.Module):
    """Reference decoder topology (decoders.py:304-323) sans encoder."""

    def __init__(self, vocab_size, feature_size, hidden, embed, att_hidden):
        super().__init__()
        self.init_h = tnn.Sequential(tnn.Linear(feature_size, hidden),
                                     tnn.Tanh())
        self.init_c = tnn.Sequential(tnn.Linear(feature_size, hidden),
                                     tnn.Tanh())
        self.embedding = tnn.Embedding(vocab_size, embed)

        class Attention(tnn.Module):

            def __init__(self):
                super().__init__()
                self.query_to_hidden = tnn.Linear(hidden, att_hidden)
                self.key_to_hidden = tnn.Linear(feature_size, att_hidden)
                self.output = tnn.Sequential(tnn.Linear(att_hidden, 1),
                                             tnn.Softmax(dim=1))

            def forward(self, query, keys):
                q = self.query_to_hidden(query).unsqueeze(1)
                k = self.key_to_hidden(keys)
                h = torch.tanh(q + k)
                return self.output(h).view(*keys.shape[:2])

        self.attend = Attention()
        self.feature_gate = tnn.Sequential(tnn.Linear(hidden, feature_size),
                                           tnn.Sigmoid())
        self.lstm = tnn.LSTMCell(embed + feature_size, hidden)
        self.output = tnn.Sequential(tnn.Dropout(p=0.0),
                                     tnn.Linear(hidden, vocab_size),
                                     tnn.LogSoftmax(dim=-1))

    def step(self, features, tokens, h, c):
        attentions = self.attend(h, features)
        attenuated = attentions.unsqueeze(-1).mul(features).sum(dim=1)
        gate = self.feature_gate(h)
        gated = attenuated * gate
        embeddings = self.embedding(tokens)
        inputs = torch.cat((embeddings, gated), dim=-1)
        h, c = self.lstm(inputs, (h, c))
        return self.output(h), attentions, h, c

    def init_state(self, features):
        pooled = features.mean(dim=1)
        return self.init_h(pooled), self.init_c(pooled)


@pytest.fixture
def model(indexer, fake_encoder):
    return decoders.Decoder(indexer, fake_encoder, embedding_size=EMBED,
                            hidden_size=HIDDEN, length=LENGTH, beam_size=4)


@pytest.fixture
def model_with_lm(indexer, fake_encoder):
    lm = lms.LanguageModel(indexer, embedding_size=EMBED, hidden_size=HIDDEN,
                           layers=2)
    return decoders.Decoder(indexer, fake_encoder, lm=lm,
                            embedding_size=EMBED, hidden_size=HIDDEN,
                            length=LENGTH, beam_size=4)


@pytest.fixture
def features(rng):
    return rng.normal(size=(3, 5, FEATURE_SIZE)).astype(np.float32)


def _torch_replica(model, indexer):
    replica = TorchDecoderCore(len(indexer), FEATURE_SIZE, HIDDEN, EMBED,
                               min(HIDDEN, FEATURE_SIZE))
    state = {k: torch.from_numpy(np.asarray(v).copy())
             for k, v in model.params.items()}
    replica.load_state_dict(state)
    replica.eval()
    return replica


def test_step_parity_with_torch(model, indexer, features):
    replica = _torch_replica(model, indexer)

    t_features = torch.from_numpy(features)
    with torch.no_grad():
        h0, c0 = replica.init_state(t_features)
    tokens = np.array([indexer.start_index] * 3)

    ours_h, ours_c = decoders.init_state(model.params, jnp.asarray(features))
    np.testing.assert_allclose(np.asarray(ours_h), h0.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_c), c0.numpy(), atol=1e-5)

    predictions, attentions, h, c, _, _ = decoders.step(
        model.params, None, jnp.asarray(features), jnp.asarray(tokens),
        ours_h, ours_c, None, None, jnp.asarray(0.2), mi=False)
    with torch.no_grad():
        t_pred, t_att, t_h, t_c = replica.step(
            t_features, torch.from_numpy(tokens), h0, c0)
    np.testing.assert_allclose(np.asarray(predictions), t_pred.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(attentions), t_att.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=1e-5)


def test_pmi_step_parity_with_torch(model_with_lm, indexer, features):
    """PMI decoding subtracts temperature * LM log-probs in-step
    (reference: decoders.py:624-630)."""
    model = model_with_lm
    replica = _torch_replica(model, indexer)

    from tests.milan.lms_test import TorchLM
    t_lm = TorchLM(len(indexer), EMBED, HIDDEN, 2)
    t_lm.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in model.lm.state_dict().items()})
    t_lm.eval()

    t_features = torch.from_numpy(features)
    with torch.no_grad():
        h0, c0 = replica.init_state(t_features)
    tokens = np.array([indexer.start_index, 0, 1])
    temperature = 0.2

    batch = len(tokens)
    h_lm0 = np.zeros((batch, 2, HIDDEN), np.float32)
    predictions, _, _, _, h_lm, c_lm = decoders.step(
        model.params, model.lm.params, jnp.asarray(features),
        jnp.asarray(tokens), jnp.asarray(np.asarray(h0)),
        jnp.asarray(np.asarray(c0)), jnp.asarray(h_lm0), jnp.asarray(h_lm0),
        jnp.asarray(temperature), mi=True, lm_layers=2)

    with torch.no_grad():
        t_pred, _, _, _ = replica.step(t_features, torch.from_numpy(tokens),
                                       h0, c0)
        emb = t_lm.embedding(torch.from_numpy(tokens))[:, None]
        _, (t_h_lm, _) = t_lm.lstm(emb)
        lm_pred = t_lm.output(t_h_lm[-1])
        expected = t_pred - temperature * lm_pred
    np.testing.assert_allclose(np.asarray(predictions), expected.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h_lm), t_h_lm.transpose(0, 1).numpy(), atol=1e-5)


def test_forced_decode_matches_torch_unroll(model, indexer, features):
    replica = _torch_replica(model, indexer)
    targets = np.array([[0, 1, 2, indexer.stop_index, indexer.pad_index,
                         indexer.pad_index]] * 3)

    outputs = model(jnp.asarray(features), strategy=jnp.asarray(targets),
                    length=LENGTH)

    t_features = torch.from_numpy(features)
    with torch.no_grad():
        h, c = replica.init_state(t_features)
        currents = torch.full((3,), indexer.start_index, dtype=torch.long)
        t_predictions = []
        for t in range(LENGTH):
            pred, _, h, c = replica.step(t_features, currents, h, c)
            currents = torch.from_numpy(targets[:, t])
            t_predictions.append(pred)
        t_predictions = torch.stack(t_predictions, dim=1)

    np.testing.assert_allclose(np.asarray(outputs.predictions),
                               t_predictions.numpy(), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(outputs.tokens), targets)
    # Scores sum the chosen-token log-probs (reference: decoders.py:461-463).
    expected_scores = np.take_along_axis(
        t_predictions.numpy(), targets[..., None], axis=-1)[..., 0].sum(1)
    np.testing.assert_allclose(np.asarray(outputs.scores), expected_scores,
                               atol=1e-4)


def test_greedy_matches_torch_unroll(model, indexer, features):
    replica = _torch_replica(model, indexer)
    outputs = model(jnp.asarray(features), strategy="greedy", length=LENGTH)

    t_features = torch.from_numpy(features)
    with torch.no_grad():
        h, c = replica.init_state(t_features)
        currents = torch.full((3,), indexer.start_index, dtype=torch.long)
        t_tokens = []
        for _ in range(LENGTH):
            pred, _, h, c = replica.step(t_features, currents, h, c)
            currents = pred.argmax(dim=1)
            t_tokens.append(currents)
        t_tokens = torch.stack(t_tokens, dim=1)
    np.testing.assert_array_equal(np.asarray(outputs.tokens),
                                  t_tokens.numpy())


def test_beam_outputs(model, features):
    outputs = model(jnp.asarray(features), strategy="beam", beam_size=4)
    assert np.asarray(outputs.tokens).shape == (3, LENGTH)
    assert np.asarray(outputs.beam_tokens).shape == (3, 4, LENGTH)
    assert np.asarray(outputs.beam_scores).shape == (3, 4)
    # Beams are sorted best-first.
    beam_scores = np.asarray(outputs.beam_scores)
    assert np.all(np.diff(beam_scores, axis=1) <= 1e-6)
    np.testing.assert_allclose(np.asarray(outputs.scores), beam_scores[:, 0],
                               atol=1e-6)
    assert len(outputs.beam_captions) == 3
    assert len(outputs.beam_captions[0]) == 4


def test_rerank_picks_lm_adjusted_best(model_with_lm, features):
    model = model_with_lm
    beamed = model(jnp.asarray(features), strategy="beam", mi=False,
                   beam_size=4)
    reranked = model(jnp.asarray(features), strategy="rerank", beam_size=4,
                     temperature=0.2)

    starts = np.full((3, 4, 1), model.lm.indexer.start_index)
    inputs_lm = np.concatenate([starts, np.asarray(beamed.beam_tokens)],
                               axis=-1)
    scores_lm = np.asarray(
        model.lm(inputs_lm.reshape(12, -1), reduce=True)).reshape(3, 4)
    expected = np.asarray(beamed.beam_scores) - 0.2 * scores_lm
    best = expected.argmax(axis=1)
    expected_tokens = np.take_along_axis(
        np.asarray(beamed.beam_tokens), best[:, None, None], axis=1)[:, 0]
    np.testing.assert_array_equal(np.asarray(reranked.tokens),
                                  expected_tokens)
    np.testing.assert_allclose(
        np.asarray(reranked.scores),
        np.take_along_axis(expected, best[:, None], axis=1)[:, 0], atol=1e-5)


def test_mi_requires_lm(model, features):
    with pytest.raises(ValueError):
        model(jnp.asarray(features), mi=True)
    with pytest.raises(ValueError):
        model(jnp.asarray(features), strategy="rerank")


def test_score(model, indexer, features):
    captions = ["the dog runs", "a blue sky"]
    scores = np.asarray(model.score(captions, jnp.asarray(features[:1])))
    assert scores.shape == (2,)
    assert np.all(scores < 0)


def test_predict_and_bleu(model, annotated_dataset):
    captions = model.predict(annotated_dataset, strategy="greedy",
                             batch_size=4)
    assert len(captions) == len(annotated_dataset)
    score = model.bleu(annotated_dataset, predictions=captions)
    assert 0 <= score.score <= 100


def test_fit_decreases_loss(indexer, annotated_dataset):
    model = decoders.Decoder(indexer, FakeEncoder(), embedding_size=EMBED,
                             hidden_size=HIDDEN, length=LENGTH, beam_size=4)
    features = model.encoder.map(annotated_dataset, image_index=2,
                                 mask_index=3)
    features = features.reshape(len(annotated_dataset), -1, FEATURE_SIZE)

    targets = np.asarray(model.indexer(
        [annotated_dataset[i][4][0] for i in range(len(annotated_dataset))],
        length=LENGTH - 1))[:, 1:]
    before = float(decoders.train_loss(
        model.params, None, jnp.asarray(features), jnp.asarray(targets),
        None, start_index=indexer.start_index, pad_index=indexer.pad_index,
        length=LENGTH, regularization_weight=1.0))

    model.fit(annotated_dataset, batch_size=4, max_epochs=8, patience=20,
              hold_out=0.34, display_progress_as=None)

    after = float(decoders.train_loss(
        model.params, None, jnp.asarray(features), jnp.asarray(targets),
        None, start_index=indexer.start_index, pad_index=indexer.pad_index,
        length=LENGTH, regularization_weight=1.0))
    assert after < before


def test_serialization_round_trip(model_with_lm, features):
    model = model_with_lm
    payload = model.serialize()
    assert payload["children"] == {"encoder": "FakeEncoder"}

    # Resolve FakeEncoder by monkeypatching parse, as the reference resolves
    # encoder types by registry (decoders.py:1104-1107).
    from neuron_descriptions_tpu.milan import encoders as encoders_lib
    original = encoders_lib.parse
    encoders_lib.parse = lambda key: FakeEncoder
    try:
        rebuilt = decoders.Decoder.deserialize(payload)
    finally:
        encoders_lib.parse = original

    out_a = model(jnp.asarray(features), strategy="beam")
    out_b = rebuilt(jnp.asarray(features), strategy="beam")
    assert out_a.captions == out_b.captions
    np.testing.assert_allclose(np.asarray(out_a.scores),
                               np.asarray(out_b.scores), atol=1e-5)


def test_reference_payload_schema(indexer, features):
    """A payload in the reference's exact {properties, children, state_dict}
    schema — with NO nested state dicts and all params flat at top level
    (reference: serialize.py:188-204, decoders.py:1072-1109) — builds a
    working decoder."""
    donor_lm = lms.LanguageModel(indexer, embedding_size=EMBED,
                                 hidden_size=HIDDEN, layers=2)
    donor = decoders.Decoder(indexer, FakeEncoder(), lm=donor_lm,
                             embedding_size=EMBED, hidden_size=HIDDEN,
                             length=LENGTH, beam_size=4, seed=7)

    payload = {
        "properties": {
            "indexer": indexer.serialize(),
            "encoder": {"properties": {"config": "fake", "pretrained": True},
                        "children": {}},
            "lm": donor_lm.serialize(state_dict=False),
            "embedding_size": EMBED,
            "hidden_size": HIDDEN,
            "attention_hidden_size": None,
            "dropout": 0.5,
            "length": LENGTH,
            "strategy": "rerank",
            "temperature": 0.2,
            "beam_size": 4,
        },
        "children": {"encoder": "FakeEncoder"},
        "state_dict": donor.state_dict(),
    }

    from neuron_descriptions_tpu.milan import encoders as encoders_lib

    class ConfigFakeEncoder(FakeEncoder):

        def __init__(self, config="fake", state_dict=None, **kwargs):
            super().__init__(state_dict=state_dict)

    original = encoders_lib.parse
    encoders_lib.parse = lambda key: ConfigFakeEncoder
    try:
        rebuilt = decoders.Decoder.deserialize(payload)
    finally:
        encoders_lib.parse = original

    assert rebuilt.strategy == "rerank"
    out_a = donor(jnp.asarray(features), strategy="beam", mi=False)
    out_b = rebuilt(jnp.asarray(features), strategy="beam", mi=False)
    assert out_a.captions == out_b.captions


def test_decoder_factory(annotated_dataset, fake_encoder):
    model = decoders.decoder(annotated_dataset, fake_encoder,
                             embedding_size=EMBED, hidden_size=HIDDEN)
    assert model.strategy == "beam"
    assert "dog" in model.indexer.vocab


def test_save_load(tmp_path, model_with_lm, features):
    model = model_with_lm
    file = tmp_path / "decoder.pth"
    model.save(file)
    payload = serialize.load_payload(file)
    assert set(payload) == {"properties", "children", "state_dict"}

    from neuron_descriptions_tpu.milan import encoders as encoders_lib
    original = encoders_lib.parse
    encoders_lib.parse = lambda key: FakeEncoder
    try:
        rebuilt = decoders.Decoder.load(file)
    finally:
        encoders_lib.parse = original
    out_a = model(jnp.asarray(features), strategy="greedy", mi=False)
    out_b = rebuilt(jnp.asarray(features), strategy="greedy", mi=False)
    assert out_a.captions == out_b.captions


def test_predict_mesh_sharded(model, annotated_dataset):
    """Unit-sharded captioning over the virtual 8-device mesh must produce
    the same captions as single-device decode (batch padded to mesh size)."""
    import jax
    from neuron_descriptions_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.default_mesh(len(jax.devices()))
    plain = model.predict(annotated_dataset, strategy="greedy", batch_size=4)
    sharded = model.predict(annotated_dataset, strategy="greedy",
                            batch_size=4, mesh=mesh)
    assert plain == sharded


def test_score_with_lm_uses_pmi(model_with_lm, indexer, features):
    """score() defaults to PMI when an LM is attached (reference:
    decoders.py:636-711 forwards mi through forced decoding)."""
    model = model_with_lm
    captions = ["the dog runs", "a blue sky"]
    pmi_scores = np.asarray(model.score(captions,
                                        jnp.asarray(features[:1])))
    lik_scores = np.asarray(model.score(captions,
                                        jnp.asarray(features[:1]),
                                        mi=False))
    assert pmi_scores.shape == (2,)
    assert not np.allclose(pmi_scores, lik_scores)
