"""LanguageModel tests: torch forward parity + reduce semantics + fit.

The parity test builds a torch replica of the reference LM topology
(reference: src/milan/lms.py:47-56 — embedding → 2-layer batch-first LSTM →
linear → log-softmax), loads OUR parameters into it (verifying the torch
state-dict key contract), and compares token and sequence scores.
"""
import numpy as np
import pytest

from neuron_descriptions_tpu.milan import lms

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402


class TorchLM(tnn.Module):

    def __init__(self, vocab_size, embedding_size, hidden_size, layers):
        super().__init__()
        self.embedding = tnn.Embedding(vocab_size, embedding_size)
        self.lstm = tnn.LSTM(input_size=embedding_size,
                             hidden_size=hidden_size, num_layers=layers,
                             batch_first=True)
        self.output = tnn.Sequential(tnn.Linear(hidden_size, vocab_size),
                                     tnn.LogSoftmax(dim=-1))

    def forward(self, inputs):
        hiddens, _ = self.lstm(self.embedding(inputs))
        return self.output(hiddens)


@pytest.fixture
def model(indexer):
    return lms.LanguageModel(indexer, embedding_size=8, hidden_size=16,
                             layers=2)


def test_forward_parity_with_torch(model, indexer):
    replica = TorchLM(len(indexer), 8, 16, 2)
    state = {k: torch.from_numpy(np.asarray(v))
             for k, v in model.state_dict().items()}
    # Key contract: our names load into the torch topology verbatim
    # (embedding.weight, lstm.weight_ih_l0, ..., output.0.weight).
    replica.load_state_dict(state)

    inputs = np.array([[indexer.start_index, 0, 1, 2, indexer.stop_index],
                       [indexer.start_index, 3, indexer.stop_index,
                        indexer.pad_index, indexer.pad_index]])
    ours = np.asarray(model(inputs))
    with torch.no_grad():
        theirs = replica(torch.from_numpy(inputs)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_reduce_masks_after_stop(model, indexer):
    stop = indexer.stop_index
    inputs = np.array([[indexer.start_index, 0, 1, stop, indexer.pad_index,
                        indexer.pad_index]])
    lps = np.asarray(model(inputs))
    reduced = float(np.asarray(model(inputs, reduce=True))[0])

    # Reference semantics (lms.py:93-100): score tokens at positions 1..j+1
    # where j is the stop position — one past the stop inclusive.
    expected = sum(lps[0, t, inputs[0, t + 1]] for t in range(4))
    assert reduced == pytest.approx(expected, abs=1e-4)


def test_reduce_explicit_mask(model, indexer):
    inputs = np.array([[indexer.start_index, 0, 1, 2, indexer.stop_index]])
    masks = np.array([[1, 1, 0, 0]])
    lps = np.asarray(model(inputs))
    reduced = float(np.asarray(model(inputs, reduce=True, masks=masks))[0])
    expected = lps[0, 0, inputs[0, 1]] + lps[0, 1, inputs[0, 2]]
    assert reduced == pytest.approx(expected, abs=1e-4)


def test_logp(model):
    scores = np.asarray(model.logp(["the dog runs", "a blue sky"]))
    assert scores.shape == (2,)
    assert np.all(scores < 0)


def test_fit_decreases_loss(indexer, annotated_dataset):
    model = lms.LanguageModel(indexer, embedding_size=8, hidden_size=16,
                              layers=2)
    before = np.asarray(model.logp([annotated_dataset[0][4][0]])).sum()
    model.fit(annotated_dataset, batch_size=4, max_epochs=10, patience=20,
              hold_out=0.34, display_progress_as=None)
    after = np.asarray(model.logp([annotated_dataset[0][4][0]])).sum()
    assert after > before


def test_serialization_round_trip(model, indexer):
    payload = model.serialize()
    rebuilt = lms.LanguageModel.deserialize(payload)
    inputs = np.array([[indexer.start_index, 0, 1, indexer.stop_index]])
    np.testing.assert_allclose(np.asarray(model(inputs)),
                               np.asarray(rebuilt(inputs)), atol=1e-6)


def test_lm_factory(annotated_dataset):
    model = lms.lm(annotated_dataset, embedding_size=8, hidden_size=16)
    assert model.indexer.start
    assert "dog" in model.indexer.vocab
