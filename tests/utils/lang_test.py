"""Tests for utils.lang (tokenizer / vocab / indexer / reconstruct).

Mirrors the reference's lang test coverage (reference: tests/utils/
lang_test.py themes: indexing options, round trips, reconstruct munging)
with the pinned pretrained config (lemmatize=False, ignore_stop=False,
ignore_punct=False — reference: src/milan/decoders.py:1250-1252).
"""
import pytest

from neuron_descriptions_tpu.utils import lang

TEXTS = (
    "the dog runs fast.",
    "A blue-green pattern, mostly dogs.",
    "the dog isn't running",
)


@pytest.fixture
def tokenize():
    return lang.tokenizer(lemmatize=False, ignore_stop=False,
                          ignore_punct=False)


@pytest.fixture
def indexer(tokenize):
    return lang.indexer(TEXTS, tokenize=tokenize, start=True, stop=True,
                        pad=True, unk=True)


def test_tokenizer_basics(tokenize):
    assert tokenize("The dog runs.") == ("the", "dog", "runs", ".")
    assert tokenize("blue-green edge") == ("blue", "-", "green", "edge")
    assert tokenize("isn't running") == ("is", "n't", "running")
    assert tokenize("a, b; c") == ("a", ",", "b", ";", "c")


def test_tokenizer_multi(tokenize):
    results = tokenize(["a dog.", "two dogs"])
    assert results == (("a", "dog", "."), ("two", "dogs"))


def test_tokenizer_flags():
    drop_punct = lang.tokenizer(lemmatize=False, ignore_stop=False,
                                ignore_punct=True)
    assert drop_punct("the dog, runs.") == ("the", "dog", "runs")
    drop_stop = lang.tokenizer(lemmatize=False, ignore_stop=True,
                               ignore_punct=True)
    assert drop_stop("the dog runs") == ("dog", "runs")


def test_vocab_frequency_order(tokenize):
    vocabulary = lang.vocab(TEXTS, tokenize=tokenize)
    # "the" and "dog" appear twice; most-common-first ordering.
    assert vocabulary.tokens.index("the") < vocabulary.tokens.index("runs")
    assert vocabulary["the"] == vocabulary.tokens.index("the")
    assert "dog" in vocabulary
    assert 0 in vocabulary
    assert len(vocabulary) not in vocabulary


def test_vocab_ignore(tokenize):
    vocabulary = lang.vocab(TEXTS, tokenize=tokenize, ignore_rarer_than=1)
    assert all(tok in ("the", "dog", ".") for tok in vocabulary.tokens)


def test_indexer_special_layout(indexer):
    size = len(indexer.vocab)
    assert indexer.start_index == size
    assert indexer.stop_index == size + 1
    assert indexer.pad_index == size + 2
    assert indexer.unk_index == size + 3
    assert len(indexer) == size + 4
    assert indexer[indexer.start_index] == lang.START_TOKEN
    assert indexer[lang.UNK_TOKEN] == indexer.unk_index


def test_index_round_trip(indexer):
    indexed = indexer("the dog runs fast")
    assert indexed[0] == indexer.start_index
    assert indexed[-1] in (indexer.stop_index, indexer.pad_index)
    tokens = indexer.unindex(list(indexed), specials=False)
    assert tokens == ("the", "dog", "runs", "fast")


def test_index_unk_and_padding(indexer):
    indexed = indexer(["the walrus runs", "the dog"], length=4)
    # 4 tokens + start + stop = 6 slots.
    assert all(len(seq) == 6 for seq in indexed)
    assert indexer.unk_index in indexed[0]
    assert indexed[1][-1] == indexer.pad_index


def test_index_no_unk_drops(indexer):
    indexed = indexer.index(("the", "walrus", "runs"), unk=False,
                            start=False, stop=False, pad=False)
    tokens = indexer.unindex(list(indexed))
    assert tokens == ("the", "runs")


def test_index_stop_truncation(indexer):
    indexed = indexer.index(("the", "dog", "runs", "fast"), start=True,
                            stop=True, pad=True, unk=True, length=2)
    # length=2 (+2 specials) = 4; stop must terminate the sequence.
    assert len(indexed) == 4
    assert indexed[-1] == indexer.stop_index


def test_unindex_unknown_raises(indexer):
    with pytest.raises(ValueError):
        indexer.unindex([len(indexer) + 5])


def test_reconstruct_munging(indexer):
    tokens = ("the", "dog", ",", "no", "-", "slip", ".")
    assert indexer.reconstruct(tokens) == "The dog, no-slip."


def test_reconstruct_truncates_at_stop(indexer):
    indexed = list(indexer("the dog runs fast"))
    # Everything after the stop index is ignored.
    indexed = indexed + [indexed[1]]
    text = indexer.reconstruct(indexed)
    assert text == "The dog runs fast"


def test_reconstruct_capitalizes_sentences(indexer):
    tokens = ("the", "dog", ".", "the", "dog", "runs")
    assert indexer.reconstruct(tokens) == "The dog. The dog runs"


def test_reconstruct_batched(indexer):
    indexed = indexer(["the dog", "runs fast"])
    texts = indexer.reconstruct([list(seq) for seq in indexed])
    assert texts == ("The dog", "Runs fast")


def test_reconstruct_empty_raises(indexer):
    with pytest.raises(ValueError):
        indexer.reconstruct([])


def test_serialization_round_trip(indexer):
    payload = indexer.serialize()
    rebuilt = lang.Indexer.deserialize(payload)
    assert rebuilt.vocab.tokens == indexer.vocab.tokens
    assert rebuilt.start_index == indexer.start_index
    assert rebuilt("the dog runs") == indexer("the dog runs")


def test_tokenizer_deserialize_discards_nlp():
    payload = {
        "properties": {
            "nlp": ({"nlp": {"lang": "en"}}, b"opaque-spacy-bytes"),
            "lemmatize": False,
            "lowercase": True,
            "ignore_stop": False,
            "ignore_punct": False,
        },
        "children": {},
    }
    tokenize = lang.Tokenizer.deserialize(payload)
    assert tokenize("The dog.") == ("the", "dog", ".")


def test_join():
    assert lang.join("abc") == "abc"
    assert lang.join(["a", "b"]) == "a b"
    assert lang.join({"b", "a"}) == "a b"
    with pytest.raises(ValueError):
        lang.join(5)


def test_reconstruct_realistic_captions(indexer):
    """MILAN-paper-style captions survive tokenize -> reconstruct."""
    tokenize = lang.tokenizer(lemmatize=False, ignore_stop=False,
                              ignore_punct=False)
    captions = (
        "The heads of geese and ducks",
        "Horizontal and vertical lines on a screen",
        "The tops of buildings against the sky",
        "Blue-green areas of water",
        "Text on a white background, usually words",
    )
    for caption in captions:
        tokens = tokenize(caption)
        rebuilt = indexer.reconstruct(list(tokens))
        assert rebuilt == caption.capitalize() or rebuilt == caption, (
            caption, rebuilt)


def test_tokenize_index_reconstruct_round_trip(indexer):
    """Full chain with in-vocab words: text -> ids -> text."""
    text = "the dog runs fast"
    ids = indexer(text)
    assert indexer.reconstruct(list(ids)) == "The dog runs fast"
