"""Tests for milannotations key registry and load()."""
import csv

import numpy as np
import pytest

from neuron_descriptions_tpu import milannotations
from neuron_descriptions_tpu.milannotations import loaders


def test_keys_cover_reference_registry():
    keys = loaders.KEYS
    for name in ("alexnet/imagenet", "alexnet/places365",
                 "resnet152/imagenet", "resnet152/places365",
                 "biggan/imagenet", "biggan/places365",
                 "dino_vits8/imagenet"):
        assert name in set(loaders.default_dataset_configs()), name
    assert keys.BASE == "base"
    assert keys.NOT_ALEXNET_IMAGENET == "not-alexnet-imagenet"


def test_groupings_partition():
    groupings = loaders.DATASET_GROUPINGS
    assert len(groupings["base"]) == 6
    assert set(groupings["cls"]) | set(groupings["gen"]) == set(
        groupings["base"])
    for excluded in groupings["base"]:
        not_key = f'not-{excluded.replace("/", "-")}'
        assert set(groupings[not_key]) == set(groupings["base"]) - {excluded}


def _write_top_images_tree(root, layers=("layer0",), units=2, k=2, size=8):
    rng = np.random.default_rng(0)
    for layer in layers:
        layer_dir = root / layer
        layer_dir.mkdir(parents=True)
        np.save(layer_dir / "images.npy",
                (rng.random((units, k, 3, size, size)) * 255).astype(
                    np.uint8))
        np.save(layer_dir / "masks.npy",
                (rng.random((units, k, 1, size, size)) > 0.5).astype(
                    np.uint8))
    with (root / "annotations.csv").open("w") as handle:
        writer = csv.writer(handle)
        writer.writerow(["layer", "unit", "summary"])
        for layer in layers:
            for unit in range(units):
                # Registry configs filter to units with >= 3 annotations
                # (annotation_count=3, reference: loaders.py:184-215).
                for rep in range(3):
                    writer.writerow([layer, unit,
                                     f"{layer} unit {unit} v{rep}"])


def test_load_raw_path(tmp_path):
    root = tmp_path / "custom"
    _write_top_images_tree(root)
    dataset = milannotations.load("custom", path=root)
    assert len(dataset) == 2


def test_load_unknown_key(tmp_path, monkeypatch):
    from neuron_descriptions_tpu.utils import env
    monkeypatch.setenv(env.ENV_DATA_DIR, str(tmp_path))
    with pytest.raises(KeyError):
        milannotations.load("not-a-real-dataset-key")


def test_load_registry_key_local(tmp_path, monkeypatch):
    """A registry key whose data already sits in the data dir loads without
    any download."""
    from neuron_descriptions_tpu.utils import env
    monkeypatch.setenv(env.ENV_DATA_DIR, str(tmp_path))
    root = tmp_path / "alexnet" / "places365"
    _write_top_images_tree(root)
    dataset = milannotations.load("alexnet/places365")
    assert len(dataset) == 2
    assert dataset[0][4]  # annotated
