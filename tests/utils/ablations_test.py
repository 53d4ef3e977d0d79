"""Tests for ablation tooling: zero rule, ablated wrapper, classifier."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.exemplars.models import SubjectModel
from neuron_descriptions_tpu.utils import ablations


def _subject(seed=0, units=4, classes=3):
    rng = np.random.default_rng(seed)
    params = {
        "conv.weight": jnp.asarray(
            rng.normal(size=(units, 3, 3, 3)).astype(np.float32) * 0.5),
        "fc.weight": jnp.asarray(
            rng.normal(size=(classes, units)).astype(np.float32)),
        "fc.bias": jnp.zeros((classes,)),
    }

    def apply(p, x, edits=None):
        h = jax.lax.conv_general_dilated(
            x, p["conv.weight"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        if edits and "conv" in edits:
            h = edits["conv"](h)
        pooled = h.mean(axis=(2, 3))
        return pooled @ p["fc.weight"].T + p["fc.bias"], {"conv": h}

    return SubjectModel(apply=apply, params=params, layers=("conv",))


class Dataset:

    def __init__(self, n=24, seed=0):
        rng = np.random.default_rng(seed)
        self.images = rng.random((n, 3, 8, 8)).astype(np.float32)
        self.labels = rng.integers(0, 3, n)

    def __getitem__(self, index):
        return self.images[index], int(self.labels[index])

    def __len__(self):
        return len(self.images)


def test_zero_rule(rng):
    features = jnp.asarray(rng.normal(size=(2, 5, 3, 3)).astype(np.float32))
    zeroed = np.asarray(ablations.zero([1, 3])(features))
    np.testing.assert_allclose(zeroed[:, [1, 3]], 0.0)
    np.testing.assert_allclose(zeroed[:, [0, 2, 4]],
                               np.asarray(features)[:, [0, 2, 4]])


def test_zero_rule_rejects_non_4d(rng):
    with pytest.raises(ValueError):
        ablations.zero([0])(jnp.zeros((2, 3)))


def test_ablated_context(rng):
    model = _subject()
    images = jnp.asarray(rng.random((2, 3, 8, 8)).astype(np.float32))
    _, base_taps = model(images)
    with ablations.ablated(model, [("conv", 0), ("conv", 2)]) as edited:
        _, taps = edited(images)
    acts = np.asarray(taps["conv"])
    np.testing.assert_allclose(acts[:, [0, 2]], 0.0)
    np.testing.assert_allclose(acts[:, [1, 3]],
                               np.asarray(base_taps["conv"])[:, [1, 3]])
    # Original model is untouched.
    _, after = model(images)
    np.testing.assert_allclose(np.asarray(after["conv"]),
                               np.asarray(base_taps["conv"]))


def test_classifier_predict_and_accuracy():
    model = _subject()
    classifier = ablations.ImageClassifier(model)
    dataset = Dataset()
    predictions = classifier.predict(dataset, batch_size=8)
    assert predictions.shape == (len(dataset),)
    accuracy = classifier.accuracy(dataset, predictions=predictions)
    assert 0.0 <= accuracy <= 1.0
    accuracies = classifier.accuracies(dataset, predictions=predictions)
    assert set(accuracies) <= {0, 1, 2}


def test_classifier_ablation_changes_predictions():
    model = _subject()
    classifier = ablations.ImageClassifier(model)
    dataset = Dataset()
    base_logits = np.asarray(classifier(dataset.images)[0])
    with ablations.ablated(model, [("conv", unit)
                                   for unit in range(4)]) as edited:
        zeroed_logits = np.asarray(edited(jnp.asarray(dataset.images))[0])
    assert not np.allclose(base_logits, zeroed_logits)


def test_classifier_fit_improves_loss():
    model = _subject(seed=5)
    classifier = ablations.ImageClassifier(model)
    dataset = Dataset(n=30)
    before = classifier.accuracy(dataset)
    classifier.fit(dataset, batch_size=10, max_epochs=15, patience=30,
                   hold_out=0.2, display_progress_as=None)
    after = classifier.accuracy(dataset)
    assert after >= before


def test_classifier_fit_layer_restriction():
    model = _subject()
    classifier = ablations.ImageClassifier(model)
    dataset = Dataset(n=12)
    conv_before = np.asarray(model.params["conv.weight"]).copy()
    classifier.fit(dataset, batch_size=6, max_epochs=2, patience=10,
                   hold_out=0.25, layers=["fc"], display_progress_as=None)
    np.testing.assert_array_equal(
        np.asarray(classifier.model.params["conv.weight"]), conv_before)

    with pytest.raises(KeyError):
        classifier.fit(dataset, layers=["nope"], hold_out=0.25,
                       display_progress_as=None)
