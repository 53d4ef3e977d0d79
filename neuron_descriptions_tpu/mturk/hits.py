"""Generating and post-processing MTurk HITs (reference: src/mturk/hits.py).

``generate_hits_csv`` writes one HIT row per (layer, unit) with the top-k
image URLs; ``strip_results_csv`` reduces the raw AMT results export to the
(layer, unit, summary) triples that become ``annotations.csv``, applying
optional cleanup rules and spellchecking.
"""
import collections
import csv
import pathlib
import random
from typing import Callable, Mapping, Optional, Sequence
from urllib import request

from neuron_descriptions_tpu.utils import lang
from neuron_descriptions_tpu.utils.typing import (Layer, PathLike,
                                                  StrSequence)

__all__ = ["generate_hits_csv", "strip_results_csv"]

GenerateUrlsFn = Callable[[Layer, int, int], Sequence[str]]


def generate_hits_csv(
    dataset,
    csv_file: PathLike,
    generate_urls: GenerateUrlsFn,
    validate_urls: bool = True,
    limit: Optional[int] = None,
    layer_column: str = "layer",
    unit_column: str = "unit",
    image_url_column_prefix: str = "image_url_",
    display_progress: bool = True,
) -> None:
    """Write one HIT row per unit with its top-image URLs
    (reference: hits.py:17-98).

    The caller provides ``generate_urls(layer, unit, k)`` since image
    hosting is out of scope for the library.
    """
    del display_progress
    csv_file = pathlib.Path(csv_file)
    csv_file.parent.mkdir(exist_ok=True, parents=True)

    k = dataset.k
    header = [layer_column, unit_column]
    header += [f"{image_url_column_prefix}{i + 1}" for i in range(k)]

    samples = list(dataset.samples)
    if limit is not None and len(samples) > limit:
        samples = random.sample(samples, k=limit)

    rows = [header]
    for sample in samples:
        layer, unit = sample.layer, sample.unit
        urls = list(generate_urls(layer, unit, k))
        if len(urls) > k:
            raise ValueError(f"generate_urls returned {len(urls)} "
                             f"but each unit has <= {k}")
        if validate_urls:
            for url in urls:
                code = request.urlopen(url).getcode()
                if code != 200:
                    raise ValueError(f"bad url (code {code}): {url}")
        row = [str(layer), str(unit)] + urls
        row += [""] * (k + 2 - len(row))
        rows.append(row)

    with csv_file.open("w") as handle:
        csv.writer(handle).writerows(rows)


ResultsRow = Mapping[str, str]
TransformFn = Callable[[str, ResultsRow], str]


def _build_replacements(remove: Optional[StrSequence],
                        replace: Optional[Mapping[str, str]]
                        ) -> "collections.OrderedDict":
    table: "collections.OrderedDict" = collections.OrderedDict(replace or {})
    for item in remove or ():
        table.setdefault(item, "")
    return table


def strip_results_csv(
    results_csv_file: PathLike,
    out_csv_file: Optional[PathLike] = None,
    in_layer_column: str = "Input.layer",
    in_unit_column: str = "Input.unit",
    in_annotation_column: str = "Answer.summary",
    in_rejection_column: str = "RejectionTime",
    out_layer_column: str = "layer",
    out_unit_column: str = "unit",
    out_annotation_column: str = "summary",
    keep_rejected: bool = False,
    spellcheck: bool = False,
    remove_prefixes: Optional[StrSequence] = None,
    remove_substrings: Optional[StrSequence] = None,
    remove_suffixes: Optional[StrSequence] = None,
    replace_prefixes: Optional[Mapping[str, str]] = None,
    replace_substrings: Optional[Mapping[str, str]] = None,
    replace_suffixes: Optional[Mapping[str, str]] = None,
    replace_exact: Optional[Mapping[str, str]] = None,
    transform_layer: Optional[TransformFn] = None,
    transform_unit: Optional[TransformFn] = None,
    transform_annotation: Optional[TransformFn] = None,
) -> None:
    """Strip an AMT results CSV to (layer, unit, annotation) rows
    (reference: hits.py:101-289).

    Annotations are lowercased, rejected HITs dropped (unless
    ``keep_rejected``), and the prefix/substring/suffix/exact replacement
    tables applied in that order. ``spellcheck=True`` requires the optional
    ``pyspellchecker`` package.
    """
    results_csv_file = pathlib.Path(results_csv_file)
    if not results_csv_file.is_file():
        raise FileNotFoundError(f"file not found: {results_csv_file}")

    out_csv_file = pathlib.Path(out_csv_file or results_csv_file)
    out_csv_file.parent.mkdir(exist_ok=True, parents=True)

    with results_csv_file.open("r") as handle:
        reader = csv.DictReader(handle)
        assert reader.fieldnames is not None, "null columns?"
        fields = set(reader.fieldnames)
        inputs = tuple(reader)

    for column in (in_layer_column, in_unit_column, in_annotation_column,
                   in_rejection_column):
        if column not in fields:
            raise KeyError(f"mturk results csv missing column: {column}")

    prefixes = _build_replacements(remove_prefixes, replace_prefixes)
    substrings = _build_replacements(remove_substrings, replace_substrings)
    suffixes = _build_replacements(remove_suffixes, replace_suffixes)
    exact = collections.OrderedDict(replace_exact or {})

    if spellcheck:
        try:
            import spellchecker
        except ImportError as error:
            raise RuntimeError(
                "spellcheck=True requires pyspellchecker") from error
        spell = spellchecker.SpellChecker()
        vocabulary = lang.vocab(
            [row[in_annotation_column] for row in inputs],
            tokenize=lang.tokenizer(lemmatize=False, ignore_stop=False,
                                    ignore_punct=False))
        for word in spell.unknown(vocabulary.tokens):
            correction = spell.correction(word)
            for punct in (" ", ",", "--", "-", "'", '"', ":", ";"):
                prefixes.setdefault(f"{word}{punct}",
                                    f"{correction}{punct}")
            for punct in (" ", ",", ".", "'", '"', "--", "-"):
                substrings.setdefault(f" {word}{punct}",
                                      f" {correction}{punct}")
            for punct in ("", ".", "'"):
                suffixes.setdefault(f" {word}{punct}",
                                    f" {correction}{punct}")
            exact.setdefault(word, correction)

    outputs = [(out_layer_column, out_unit_column, out_annotation_column)]
    for row in inputs:
        if not keep_rejected and row[in_rejection_column].strip():
            continue

        layer = row[in_layer_column]
        if transform_layer is not None:
            layer = transform_layer(layer, row)

        unit = row[in_unit_column]
        if transform_unit is not None:
            unit = transform_unit(unit, row)

        annotation = row[in_annotation_column].lower()
        for prefix, replacement in prefixes.items():
            if annotation.startswith(prefix):
                annotation = replacement + annotation[len(prefix):]
        for substring, replacement in substrings.items():
            annotation = annotation.replace(substring, replacement)
        for suffix, replacement in suffixes.items():
            if annotation.endswith(suffix):
                annotation = annotation[:-len(suffix)] + replacement
        for string, replacement in exact.items():
            if annotation == string:
                annotation = replacement
        annotation = annotation.strip()

        if transform_annotation is not None:
            annotation = transform_annotation(annotation, row)

        outputs.append((layer, unit, annotation))

    with out_csv_file.open("w") as handle:
        csv.writer(handle).writerows(outputs)
