"""Language preprocessing: tokenizer, vocabulary, indexer, detokenizer.

Rebuild of the reference's language tooling (reference: src/utils/lang.py).
The reference wraps spaCy's ``en_core_web_sm``; we ship a dependency-free
rule tokenizer that reproduces spaCy's English tokenization behavior for the
configuration every pretrained MILAN payload pins (``lemmatize=False,
lowercase=True, ignore_stop=False, ignore_punct=False`` — reference:
src/milan/decoders.py:1250-1252). That config never needs the tagger or
lemmatizer, so faithful tokenization is a matter of replicating spaCy's
prefix/suffix/infix splitting and English contraction exceptions.

Index layout parity is load-bearing: the four special tokens are *virtual* —
their indices sit immediately after the vocabulary (start=len(vocab),
stop=+1, pad=+2, unk=+3 — reference: lang.py:242-260) and must match or
pretrained embedding rows are misaligned.
"""
import collections
import dataclasses
import functools
import re
from typing import (Any, Iterable, Mapping, Optional, Sequence, Union)

from neuron_descriptions_tpu.utils import serialize
from neuron_descriptions_tpu.utils.typing import StrSequence

__all__ = [
    "Tokenizer",
    "tokenizer",
    "Vocab",
    "vocab",
    "Indexer",
    "indexer",
    "join",
    "START_TOKEN",
    "STOP_TOKEN",
    "PAD_TOKEN",
    "UNK_TOKEN",
]

# ---------------------------------------------------------------------------
# Tokenizer.
# ---------------------------------------------------------------------------

# Characters spaCy's English punct rules strip from token edges / split on.
_PREFIX_RE = re.compile(
    r"""^([\(\)\[\]\{\}<>"'`“”‘’«».,;:!?\-–—…$£€#%&*+/\\])""")
_SUFFIX_RE = re.compile(r"""([\(\)\[\]\{\}<>"'`“”‘’«».,;:!?%…\-–—])$""")
# Infixes: split around hyphens/slashes/ellipses between word characters
# (spaCy splits "blue-green" -> ["blue", "-", "green"]).
_INFIX_RE = re.compile(r"(\.\.\.+|[\-–—/])")
# "word." with a single trailing period (not an abbreviation like "U.S.").
_TRAILING_PERIOD_RE = re.compile(r"^([^\.]+)(\.)$")

# English contraction suffixes (spaCy tokenizer_exceptions subset that
# covers the caption corpus): n't, 's, 're, 've, 'll, 'd, 'm.
_CONTRACTION_RE = re.compile(
    r"^(.+?)(n['’]t|['’](?:s|re|ve|ll|d|m))$", re.IGNORECASE)
# Irregular exceptions mapping the full lowercase string to its token split.
_EXCEPTIONS = {
    "cannot": ("can", "not"),
    "gonna": ("gon", "na"),
    "gotta": ("got", "ta"),
    "wanna": ("wan", "na"),
    "lemme": ("lem", "me"),
    "won't": ("wo", "n't"),
    "can't": ("ca", "n't"),
    "shan't": ("sha", "n't"),
    "'cause": ("'cause",),
    "o'clock": ("o'clock",),
}

# A compact English stop-word list (spaCy's STOP_WORDS subset) used only
# when ``ignore_stop=True`` — pretrained payloads never enable it.
_STOP_WORDS = frozenset("""
a about above after again all am an and any are as at be because been before
being below between both but by can did do does doing down during each few
for from further had has have having he her here hers herself him himself
his how i if in into is it its itself just me more most my myself no nor not
now of off on once only or other our ours ourselves out over own same she
should so some such than that the their theirs them themselves then there
these they this those through to too under until up very was we were what
when where which while who whom why will with you your yours yourself
yourselves
""".split())

_PUNCT_CHARS = frozenset(".,;:!?-–—()[]{}<>\"'`“”‘’«»…/\\")


def _is_punct(token: str) -> bool:
    return all(char in _PUNCT_CHARS for char in token)


def _split_token(text: str) -> Sequence[str]:
    """Split one whitespace-delimited chunk like spaCy's English rules."""
    if not text:
        return ()
    lowered = text.lower()
    if lowered in _EXCEPTIONS:
        return _EXCEPTIONS[lowered]

    # Strip prefixes.
    prefix_match = _PREFIX_RE.match(text)
    if prefix_match and len(text) > 1:
        return (prefix_match.group(1),
                *_split_token(text[len(prefix_match.group(1)):]))

    # Strip suffixes (but keep abbreviation-internal periods intact).
    suffix_match = _SUFFIX_RE.search(text)
    if suffix_match and len(text) > 1:
        stem = text[:-1]
        suffix = suffix_match.group(1)
        if suffix != "." or _TRAILING_PERIOD_RE.match(text):
            return (*_split_token(stem), suffix)

    # Contractions.
    contraction = _CONTRACTION_RE.match(text)
    if contraction and contraction.group(1):
        return (contraction.group(1), contraction.group(2))

    # Infix splitting (hyphens, slashes) between characters.
    if len(text) > 1:
        parts = _INFIX_RE.split(text)
        parts = [part for part in parts if part]
        if len(parts) > 1:
            out = []
            for part in parts:
                out.extend(_split_token(part) if not _INFIX_RE.fullmatch(part)
                           else (part,))
            return tuple(out)

    return (text,)


@dataclasses.dataclass(frozen=True)
class Tokenizer(serialize.Serializable):
    """Rule tokenizer mirroring the reference's spaCy wrapper.

    Reference: src/utils/lang.py:14-71. The ``nlp`` field there holds a
    spaCy pipeline; payloads serialize it as an opaque (config, bytes)
    tuple. We accept and discard that field on deserialization — the rule
    tokenizer is reconstructed from the boolean flags alone.
    """

    lemmatize: bool = True
    lowercase: bool = True
    ignore_stop: bool = True
    ignore_punct: bool = True

    def __call__(
        self,
        texts: Union[str, StrSequence],
    ) -> Union[StrSequence, Sequence[StrSequence]]:
        """Tokenize one text (str in, tuple out) or many (seq in/out)."""
        singleton = isinstance(texts, str)
        tokenized = []
        for text in ([texts] if singleton else texts):
            tokens = []
            for chunk in str(text).split():
                for token in _split_token(chunk):
                    if self.ignore_punct and _is_punct(token):
                        continue
                    if self.ignore_stop and token.lower() in _STOP_WORDS:
                        continue
                    if self.lemmatize:
                        token = _lemmatize(token)
                    if self.lowercase:
                        token = token.lower()
                    if token.strip():
                        tokens.append(token)
            tokenized.append(tuple(tokens))
        return tokenized[0] if singleton else tuple(tokenized)

    def properties(self) -> serialize.Properties:
        """Override `Serializable.properties`."""
        return {
            "lemmatize": self.lemmatize,
            "lowercase": self.lowercase,
            "ignore_stop": self.ignore_stop,
            "ignore_punct": self.ignore_punct,
        }

    @classmethod
    def deserialize(cls, serialized: Mapping[str, Any],
                    **kwargs: Any) -> "Tokenizer":
        """Rebuild, tolerating (and discarding) the reference's nlp blob."""
        properties = dict(serialized["properties"])
        properties.pop("nlp", None)
        return cls(**properties)


_LEMMA_SUFFIXES = (
    ("ies", "y"),
    ("sses", "ss"),
    ("s", ""),
)


def _lemmatize(token: str) -> str:
    """Crude plural-stripping lemmatizer.

    Only used when ``lemmatize=True``, which no pretrained payload enables;
    provided so the training-side default config is runnable.
    """
    lowered = token.lower()
    for suffix, replacement in _LEMMA_SUFFIXES:
        if lowered.endswith(suffix) and len(lowered) > len(suffix) + 1:
            if suffix == "s" and lowered.endswith(("ss", "us", "is")):
                continue
            return lowered[:-len(suffix)] + replacement
    return lowered


def tokenizer(lemmatize: bool = True, **kwargs: Any) -> Tokenizer:
    """Create a tokenizer (reference: lang.py:74-90)."""
    kwargs.pop("nlp", None)
    return Tokenizer(lemmatize=lemmatize, **kwargs)


# ---------------------------------------------------------------------------
# Vocab.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Vocab(serialize.Serializable):
    """Frequency-ordered token vocabulary (reference: lang.py:93-178)."""

    tokens: StrSequence

    def __post_init__(self) -> None:
        object.__setattr__(self, "tokens", tuple(self.tokens))

    def __getitem__(self, token: Union[int, slice, str]
                    ) -> Union[str, StrSequence, int]:
        if isinstance(token, (int, slice)):
            return self.tokens[token]
        return self.ids[token]

    def __len__(self) -> int:
        return len(self.tokens)

    def __contains__(self, token: Union[int, str]) -> bool:
        if isinstance(token, int):
            return 0 <= token < len(self)
        return token in self.unique

    @functools.cached_property
    def ids(self) -> Mapping[str, int]:
        return {token: index for index, token in enumerate(self.tokens)}

    @functools.cached_property
    def unique(self) -> frozenset:
        return frozenset(self.ids)

    def properties(self) -> serialize.Properties:
        return {"tokens": self.tokens}


def vocab(texts: StrSequence,
          tokenize: Optional[Tokenizer] = None,
          ignore_rarer_than: Optional[int] = None,
          ignore_in: Optional[Iterable[str]] = None) -> Vocab:
    """Create a vocabulary from texts, most-common first
    (reference: lang.py:181-221)."""
    if tokenize is None:
        tokenize = tokenizer()
    if ignore_in is not None:
        ignore_in = frozenset(ignore_in)

    def ignore(token: str, count: int) -> bool:
        yn = ignore_rarer_than is not None and count <= ignore_rarer_than
        yn |= ignore_in is not None and token in ignore_in
        return yn

    tokens = [tok for toks in tokenize(texts) for tok in toks]
    counts = collections.Counter(tokens)
    kept = [token for token, count in counts.most_common()
            if not ignore(token, count)]
    return Vocab(tuple(kept))


# ---------------------------------------------------------------------------
# Indexer.
# ---------------------------------------------------------------------------
START_TOKEN = "<start>"
STOP_TOKEN = "<stop>"
PAD_TOKEN = "<pad>"
UNK_TOKEN = "<unk>"


@dataclasses.dataclass(frozen=True)
class Indexer(serialize.Serializable):
    """Maps text to integer ID sequences (reference: lang.py:231-747).

    Special-token indices are virtual, appended after the vocabulary:
    start=len(vocab), stop=+1, pad=+2, unk=+3 (reference: lang.py:242-260).
    """

    vocab: Vocab
    tokenize: Tokenizer
    start: bool = False
    stop: bool = False
    pad: bool = False
    unk: bool = False
    length: Optional[int] = None

    @property
    def start_index(self) -> int:
        return len(self.vocab)

    @property
    def stop_index(self) -> int:
        return len(self.vocab) + 1

    @property
    def pad_index(self) -> int:
        return len(self.vocab) + 2

    @property
    def unk_index(self) -> int:
        return len(self.vocab) + 3

    @functools.cached_property
    def specials(self) -> Mapping[int, str]:
        return collections.OrderedDict((
            (self.start_index, START_TOKEN),
            (self.stop_index, STOP_TOKEN),
            (self.pad_index, PAD_TOKEN),
            (self.unk_index, UNK_TOKEN),
        ))

    @functools.cached_property
    def tokens(self) -> StrSequence:
        return tuple(list(self.vocab.tokens) + list(self.specials.values()))

    @functools.cached_property
    def ids(self) -> Mapping[str, int]:
        ids = dict(self.vocab.ids)
        for index, token in self.specials.items():
            ids[token] = index
        return ids

    @functools.cached_property
    def unique(self) -> frozenset:
        return frozenset(self.ids)

    def __getitem__(self, token: Union[int, slice, str]
                    ) -> Union[str, StrSequence, int]:
        if isinstance(token, (int, slice)):
            return self.tokens[token]
        return self.ids[token]

    def __len__(self) -> int:
        return len(self.vocab) + len(self.specials)

    def __contains__(self, token: Union[int, str]) -> bool:
        if isinstance(token, int):
            return 0 <= token < len(self)
        return token in self.unique

    def __call__(self, texts: Union[str, StrSequence],
                 **kwargs: Any) -> Any:
        """Tokenize and index one or many texts."""
        singleton = isinstance(texts, str)
        tokenized = self.tokenize([texts] if singleton else texts)
        indexed = self.index(tokenized, **kwargs)
        return indexed[0] if singleton else indexed

    def index(self,
              tokenized: Union[StrSequence, Sequence[StrSequence]],
              start: Optional[bool] = None,
              stop: Optional[bool] = None,
              pad: Optional[bool] = None,
              unk: Optional[bool] = None,
              length: Optional[int] = None) -> Any:
        """Map token sequences to ID sequences (reference: lang.py:460-515).

        ``length`` does NOT count start/stop; it is bumped by one for each.
        """
        if not tokenized:
            return ()

        singleton = isinstance(tokenized[0], str)
        start = self.start if start is None else start
        stop = self.stop if stop is None else stop
        pad = self.pad if pad is None else pad
        unk = self.unk if unk is None else unk
        length = length or self.length or max(
            len(toks) for toks in ([tokenized] if singleton else tokenized))
        for special in (start, stop):
            if special:
                length += 1

        indexed = []
        for tokens in ([tokenized] if singleton else tokenized):
            indices = []
            if start:
                indices.append(self.start_index)
            if unk:
                indices += [self.vocab.ids.get(tok, self.unk_index)
                            for tok in tokens]
            else:
                indices += [self.vocab[tok] for tok in tokens
                            if tok in self.vocab]
            if stop:
                if len(indices) >= length:
                    indices = indices[:length - 1]
                indices.append(self.stop_index)
            if len(indices) < length and pad:
                indices += [self.pad_index] * (length - len(indices))
            elif len(indices) > length:
                indices = indices[:length]
            indexed.append(tuple(indices))

        return indexed[0] if singleton else tuple(indexed)

    def unindex(self,
                indexed: Union[Sequence[int], Sequence[Sequence[int]]],
                specials: bool = True,
                start: bool = True,
                stop: bool = True,
                pad: bool = True,
                unk: bool = True) -> Any:
        """Map ID sequences back to token strings
        (reference: lang.py:573-612)."""
        if not len(indexed):
            return ()
        singleton = _is_int(indexed[0])

        unindexed = []
        for indices in ([indexed] if singleton else indexed):
            tokens = []
            for index in (int(i) for i in indices):
                if index < len(self.vocab):
                    tokens.append(self.vocab[index])
                    continue
                for (special, token), keep in zip(self.specials.items(),
                                                  (start, stop, pad, unk)):
                    if index == special:
                        if specials and keep:
                            tokens.append(token)
                        break
                else:
                    raise ValueError(f"unknown index: {index}")
            unindexed.append(tuple(tokens))

        return unindexed[0] if singleton else tuple(unindexed)

    def reconstruct(self, inputs: Any) -> Union[str, StrSequence]:
        """Detokenize IDs or tokens into display text
        (reference: lang.py:678-730).

        Truncates at the stop token, drops specials, fixes punctuation
        spacing, joins hyphens, and capitalizes sentences.
        """
        if not len(inputs):
            raise ValueError("must provide at least one seq")
        for index, item in enumerate(inputs):
            if not isinstance(item, (int, str)) and not _is_int(item) \
                    and not len(item):
                raise ValueError(f"input seq {index} is empty")

        first = inputs[0]
        if isinstance(first, str):
            tokenized = [tuple(inputs)]
            singleton = True
        elif _is_int(first):
            tokenized = [self.unindex([int(i) for i in inputs])]
            singleton = True
        elif isinstance(first[0], str):
            tokenized = [tuple(seq) for seq in inputs]
            singleton = False
        else:
            tokenized = list(
                self.unindex([[int(i) for i in seq] for seq in inputs]))
            singleton = False

        texts = []
        for tokens in tokenized:
            tokens = list(tokens)
            if STOP_TOKEN in tokens:
                tokens = tokens[:tokens.index(STOP_TOKEN)]
            text = " ".join(token for token in tokens
                            if token not in self.specials.values())
            for token in (".", ",", ";", ":"):
                text = text.replace(" " + token, token)
            for token in ("-",):
                text = text.replace(" %s" % token, token)
                text = text.replace("%s " % token, token)
            text = ". ".join(sentence.strip().capitalize()
                             for sentence in text.split(".")).strip()
            texts.append(text)

        return texts[0] if singleton else tuple(texts)

    def properties(self, **_: Any) -> serialize.Properties:
        return {
            "vocab": self.vocab,
            "tokenize": self.tokenize,
            "start": self.start,
            "stop": self.stop,
            "pad": self.pad,
            "unk": self.unk,
            "length": self.length,
        }

    @classmethod
    def resolve(cls, children: serialize.Children) -> serialize.Resolved:
        return {"vocab": Vocab, "tokenize": Tokenizer}


def _is_int(value: Any) -> bool:
    """True for python/numpy integer scalars (captions come back as both)."""
    if isinstance(value, bool):
        return False
    if isinstance(value, int):
        return True
    return hasattr(value, "__index__")


def indexer(texts: StrSequence,
            tokenize: Optional[Tokenizer] = None,
            ignore_rarer_than: Optional[int] = None,
            ignore_in: Optional[StrSequence] = None,
            **kwargs: Any) -> Indexer:
    """Create an indexer with vocab drawn from texts
    (reference: lang.py:750-778)."""
    if tokenize is None:
        tokenize = tokenizer()
    vocabulary = vocab(texts,
                       tokenize=tokenize,
                       ignore_rarer_than=ignore_rarer_than,
                       ignore_in=ignore_in)
    return Indexer(vocabulary, tokenize, **kwargs)


def join(texts: Any, delimiter: str = " ") -> str:
    """Join an annotation (str or iterable of str) into one string
    (reference: lang.py:781-800)."""
    if isinstance(texts, (set, frozenset)):
        texts = tuple(sorted(texts))
    if isinstance(texts, (list, tuple)):
        texts = delimiter.join(texts)
    if not isinstance(texts, str):
        raise ValueError(f"unknown annotation type: {type(texts).__name__}")
    return texts
