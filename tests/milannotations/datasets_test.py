"""Tests for the milannotations dataset layer.

Fixture strategy mirrors the reference (reference: tests/conftest.py:13-85):
synthetic npy trees — 2 layers × 3 units × 5 top images of 16×16 random
bytes + random binary masks — written to tempdirs; the on-disk contract is
the test seam.
"""
import csv

import numpy as np
import pytest

from neuron_descriptions_tpu import milannotations
from neuron_descriptions_tpu.milannotations import merges

N_LAYERS, N_UNITS, K, SIZE = 2, 3, 5, 16


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "model" / "dataset"
    for layer in range(N_LAYERS):
        layer_dir = root / f"layer-{layer}"
        layer_dir.mkdir(parents=True)
        images = rng.integers(0, 256, (N_UNITS, K, 3, SIZE, SIZE),
                              dtype=np.uint8)
        masks = rng.integers(0, 2, (N_UNITS, K, 1, SIZE, SIZE),
                             dtype=np.uint8)
        np.save(layer_dir / "images.npy", images)
        np.save(layer_dir / "masks.npy", masks)
    return root


@pytest.fixture
def annotated_corpus(corpus):
    rows = [("layer", "unit", "summary")]
    for layer in range(N_LAYERS):
        for unit in range(N_UNITS):
            for j in range(2):
                rows.append(
                    (f"layer-{layer}", str(unit),
                     f"description {j} of unit {unit} in layer {layer}"))
    with (corpus / "annotations.csv").open("w", newline="") as f:
        csv.writer(f).writerows(rows)
    return corpus


def test_top_images_dataset(corpus):
    dataset = milannotations.TopImagesDataset(corpus)
    assert len(dataset) == N_LAYERS * N_UNITS
    assert dataset.k == K
    assert dataset.name == "model/dataset"
    assert dataset.layers == ("layer-0", "layer-1")

    sample = dataset[0]
    assert sample.images.shape == (K, 3, SIZE, SIZE)
    assert sample.masks.shape == (K, 1, SIZE, SIZE)
    # byte -> [0, 1] renormalization applied.
    assert 0.0 <= sample.images.min() and sample.images.max() <= 1.0
    assert set(np.unique(sample.masks)) <= {0.0, 1.0}


def test_lookup_and_units(corpus):
    dataset = milannotations.TopImagesDataset(corpus)
    sample = dataset.lookup("layer-1", 2)
    assert sample.layer == "layer-1" and sample.unit == 2
    with pytest.raises(KeyError):
        dataset.lookup("nope", 0)
    with pytest.raises(KeyError):
        dataset.lookup("layer-0", 99)
    assert dataset.units([0, 1]) == (("layer-0", 0), ("layer-0", 1))


def test_missing_files_raise(tmp_path):
    root = tmp_path / "empty"
    (root / "layer-0").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        milannotations.TopImagesDataset(root)
    with pytest.raises(FileNotFoundError):
        milannotations.TopImagesDataset(tmp_path / "missing")


def test_bad_shapes_raise(tmp_path):
    root = tmp_path / "bad"
    layer = root / "layer-0"
    layer.mkdir(parents=True)
    np.save(layer / "images.npy", np.zeros((2, 3, 3, 4, 4), np.uint8))
    np.save(layer / "masks.npy", np.zeros((2, 3, 1, 5, 5), np.uint8))
    with pytest.raises(ValueError):
        milannotations.TopImagesDataset(root)


def test_annotated_dataset(annotated_corpus):
    dataset = milannotations.AnnotatedTopImagesDataset(annotated_corpus)
    assert len(dataset) == N_LAYERS * N_UNITS
    sample = dataset[0]
    assert len(sample.annotations) == 2
    assert "unit 0" in sample.annotations[0]
    assert dataset.k == K


def test_annotated_dataset_custom_columns(corpus):
    rows = [("lay", "u", "text")]
    for unit in range(N_UNITS):
        rows.append(("layer-0", str(unit), f"foo {unit}"))
    with (corpus / "annotations.csv").open("w", newline="") as f:
        csv.writer(f).writerows(rows)
    dataset = milannotations.AnnotatedTopImagesDataset(
        corpus, layer_column="lay", unit_column="u",
        annotation_column="text")
    assert dataset.lookup("layer-0", 1).annotations == ("foo 1",)


def test_annotation_count_filter(annotated_corpus):
    dataset = milannotations.AnnotatedTopImagesDataset(
        annotated_corpus, annotation_count=2)
    assert len(dataset) == N_LAYERS * N_UNITS
    dataset = milannotations.AnnotatedTopImagesDataset(
        annotated_corpus, annotation_count=3)
    assert len(dataset) == 0


def test_masked_images_and_grid(annotated_corpus):
    dataset = milannotations.AnnotatedTopImagesDataset(annotated_corpus)
    sample = dataset[0]
    arrays = sample.as_masked_images_array(opacity=0.5)
    assert arrays.shape == (K, 3, SIZE, SIZE)
    pils = sample.as_pil_images()
    assert len(pils) == K
    grid = sample.as_pil_image_grid()
    assert grid.size[0] > SIZE


def test_merge_packs_source_images(tmp_path, corpus):
    """Merging reconstructs images.npy from ids.csv + a source dataset."""
    # Drop images.npy, write ids.csv pointing into a fake source.
    rng = np.random.default_rng(1)
    source_images = rng.uniform(0, 1, (7, 3, SIZE, SIZE)).astype(np.float32)

    class Source:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return source_images[i], 0

    for layer_dir in corpus.iterdir():
        if not layer_dir.is_dir():
            continue
        (layer_dir / "images.npy").unlink()
        ids = rng.integers(0, 7, (N_UNITS, K))
        with (layer_dir / "ids.csv").open("w", newline="") as f:
            csv.writer(f).writerows(ids.tolist())

    merges.merge(corpus, Source())
    dataset = milannotations.TopImagesDataset(corpus)
    assert len(dataset) == N_LAYERS * N_UNITS
    images = np.load(corpus / "layer-0" / "images.npy")
    assert images.dtype == np.uint8
    assert images.shape == (N_UNITS, K, 3, SIZE, SIZE)


def test_load_raw_path(tmp_path, corpus):
    """load() falls back to treating the name as a raw directory path."""
    dataset = milannotations.load("anything", path=corpus)
    assert isinstance(dataset, milannotations.TopImagesDataset)
    with pytest.raises(KeyError):
        milannotations.load("not/a-real-key-or-path")


def test_groupings_cover_base():
    groupings = milannotations.DATASET_GROUPINGS
    assert len(groupings["base"]) == 6
    for key in ("cls", "gen", "imagenet", "places365"):
        assert set(groupings[key]) <= set(groupings["base"])
    assert set(groupings["not-alexnet-imagenet"]) == (
        set(groupings["base"]) - {"alexnet/imagenet"})
