"""Tests for caption metrics (BLEU / ROUGE / BERTScore plumbing)."""
import numpy as np
import pytest

from neuron_descriptions_tpu.utils import metrics


class Dataset:
    """AnnotatedTopImages-shaped: annotations at index 4."""

    def __init__(self, annotations):
        self.annotations = annotations

    def __getitem__(self, index):
        return (None, None, None, None, self.annotations[index])

    def __len__(self):
        return len(self.annotations)


def test_bleu_perfect_match():
    dataset = Dataset([("the dog runs fast today",),
                       ("a blue sky with clouds",)])
    score = metrics.bleu(dataset, ["The dog runs fast today.",
                                   "a blue sky with clouds"])
    assert score.score == pytest.approx(100.0)


def test_bleu_partial_and_preprocessing():
    dataset = Dataset([("the dog runs fast today",),
                       ("a blue sky with clouds",)])
    perfect = metrics.bleu(dataset, ["the dog runs fast today",
                                     "a blue sky with clouds"])
    partial = metrics.bleu(dataset, ["the cat runs fast today",
                                     "a blue sky with clouds"])
    assert partial.score < perfect.score


def test_bleu_multiple_references():
    dataset = Dataset([("the dog runs fast today", "a dog quickly running"),
                       ("a blue sky with clouds", "the sky is very blue")])
    score = metrics.bleu(dataset, ["the dog runs fast today",
                                   "the sky is very blue"])
    assert score.score == pytest.approx(100.0)


def test_bleu_uneven_reference_counts():
    # One sample has 2 annotations, the other 1 — must not crash or drop.
    dataset = Dataset([("the dog runs fast today", "a dog quickly running"),
                       ("a blue sky with clouds",)])
    score = metrics.bleu(dataset, ["the dog runs fast today",
                                   "a blue sky with clouds"])
    assert score.score == pytest.approx(100.0)


def test_rouge():
    dataset = Dataset([("the dog runs fast",), ("a blue sky",)])
    scores = metrics.rouge(dataset, ["the dog runs fast", "a blue sky"])
    assert scores["rouge-1"]["f"] == pytest.approx(1.0)
    worse = metrics.rouge(dataset, ["a cat sits", "green grass"])
    assert worse["rouge-1"]["f"] < 1.0


def test_rouge_skips_empty_references():
    dataset = Dataset([("the dog runs", ""), ("blue sky",)])
    scores = metrics.rouge(dataset, ["the dog runs", "blue sky"])
    assert scores["rouge-1"]["f"] == pytest.approx(1.0)


def test_bert_score_requires_local_model():
    dataset = Dataset([("the dog",)])
    with pytest.raises(RuntimeError, match="requires a local copy"):
        metrics.bert_score(dataset, ["the dog"],
                           model_name="definitely-not-a-local-model")
