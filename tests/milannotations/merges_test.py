"""Tests for the ImageNet merge layer (ids.csv -> images.npy)."""
import csv

import numpy as np
import pytest

from neuron_descriptions_tpu.milannotations import merges

UNITS, K, SIZE = 3, 2, 8


class FakeSource:
    """Source dataset of float (3, H, W) images in [0, 1]."""

    def __init__(self, n=6, bad_range=False, bad_shape=False):
        rng = np.random.default_rng(0)
        self.images = rng.random((n, 3, SIZE, SIZE)).astype(np.float32)
        if bad_range:
            self.images[0] *= 3.0
        self.bad_shape = bad_shape

    def __getitem__(self, index):
        image = self.images[index]
        if self.bad_shape and index == 0:
            return (image[:1],)
        return (image,)

    def __len__(self):
        return len(self.images)


@pytest.fixture
def unmerged_root(tmp_path):
    rng = np.random.default_rng(1)
    for layer in ("layer0", "layer1"):
        layer_dir = tmp_path / layer
        layer_dir.mkdir()
        ids = rng.integers(0, 6, size=(UNITS, K))
        with (layer_dir / "ids.csv").open("w") as handle:
            csv.writer(handle).writerows(ids.tolist())
        masks = (rng.random((UNITS, K, 1, SIZE, SIZE)) > 0.5).astype(
            np.uint8)
        np.save(layer_dir / "masks.npy", masks)
    with (tmp_path / "annotations.csv").open("w") as handle:
        writer = csv.writer(handle)
        writer.writerow(["layer", "unit", "summary"])
        for layer in ("layer0", "layer1"):
            for unit in range(UNITS):
                writer.writerow([layer, unit, f"unit {unit} things"])
    return tmp_path


def test_merge_packs_images(unmerged_root):
    source = FakeSource()
    merges.merge(unmerged_root, source)
    for layer in ("layer0", "layer1"):
        images = np.load(unmerged_root / layer / "images.npy")
        assert images.shape == (UNITS, K, 3, SIZE, SIZE)
        assert images.dtype == np.uint8
    # Spot-check content: unit 0 image 0 of layer0 == source[id] bytes.
    with (unmerged_root / "layer0" / "ids.csv").open() as handle:
        first_id = int(next(csv.reader(handle))[0])
    images = np.load(unmerged_root / "layer0" / "images.npy")
    expected = (source.images[first_id] * 255).clip(0, 255).astype(np.uint8)
    np.testing.assert_array_equal(images[0, 0], expected)


def test_merge_skips_existing_unless_forced(unmerged_root):
    source = FakeSource()
    merges.merge(unmerged_root, source)
    before = np.load(unmerged_root / "layer0" / "images.npy")
    # Mutate the source; merge without force must be a no-op.
    source.images[:] = 0.5
    merges.merge(unmerged_root, source)
    np.testing.assert_array_equal(
        np.load(unmerged_root / "layer0" / "images.npy"), before)
    merges.merge(unmerged_root, source, force=True)
    assert not np.array_equal(
        np.load(unmerged_root / "layer0" / "images.npy"), before)


def test_merge_validates_ids(unmerged_root):
    with pytest.raises(IndexError):
        merges.merge(unmerged_root, FakeSource(n=2))


def test_merge_validates_range(unmerged_root):
    with pytest.raises(ValueError, match="not in"):
        merges.merge(unmerged_root, FakeSource(bad_range=True))


def test_merge_validates_shape(unmerged_root):
    with pytest.raises(ValueError):
        merges.merge(unmerged_root, FakeSource(bad_shape=True))


def test_maybe_merge_and_load_requires_source(unmerged_root):
    with pytest.raises(ValueError, match="source"):
        merges.maybe_merge_and_load_dataset(unmerged_root)


def test_maybe_merge_and_load_missing_source_dir(unmerged_root, monkeypatch,
                                                 tmp_path_factory):
    from neuron_descriptions_tpu.utils import env
    data = tmp_path_factory.mktemp("data")
    monkeypatch.setenv(env.ENV_DATA_DIR, str(data))
    with pytest.raises(FileNotFoundError, match="source"):
        merges.maybe_merge_and_load_dataset(unmerged_root,
                                            source="imagenet")


def test_maybe_merge_and_load_merged(unmerged_root):
    merges.merge(unmerged_root, FakeSource())
    dataset = merges.maybe_merge_and_load_dataset(unmerged_root)
    # annotations.csv exists -> annotated dataset with index-4 annotations.
    assert len(dataset) == 2 * UNITS
    assert dataset[0][4]
