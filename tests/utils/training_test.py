"""Tests for training utilities (early stopping + splits)."""
import numpy as np
import pytest

from neuron_descriptions_tpu.utils import training


def test_early_stopping_decreasing():
    stopper = training.EarlyStopping(patience=2)
    assert not stopper(1.0)
    assert stopper.improved
    assert not stopper(1.5)
    assert not stopper.improved
    assert not stopper(1.4)
    assert stopper(1.3)  # 3rd non-improving value > patience=2


def test_early_stopping_increasing():
    stopper = training.EarlyStopping(patience=1, decreasing=False)
    assert not stopper(10.0)
    assert not stopper(9.0)
    assert stopper(8.0)
    assert stopper.best == 10.0


def test_random_split_partition():
    dataset = list(range(20))
    train, val = training.random_split(dataset, hold_out=0.25)
    assert len(train) == 15 and len(val) == 5
    assert sorted(train.indices + val.indices) == list(range(20))
    # Deterministic under the same seed.
    train2, val2 = training.random_split(dataset, hold_out=0.25)
    assert val.indices == val2.indices


def test_random_split_validates():
    with pytest.raises(ValueError):
        training.random_split(list(range(4)), hold_out=0.0)
    with pytest.raises(ValueError):
        training.random_split(list(range(4)), hold_out=0.1)  # empty val


def test_fixed_split():
    dataset = ["a", "b", "c", "d"]
    others, held = training.fixed_split(dataset, [1, 3])
    assert [held[i] for i in range(2)] == ["b", "d"]
    assert [others[i] for i in range(2)] == ["a", "c"]
    with pytest.raises(IndexError):
        training.fixed_split(dataset, [9])
    with pytest.raises(ValueError):
        training.fixed_split(dataset, [0, 1, 2, 3])


def test_preloaded_image_folder(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        (tmp_path / cls).mkdir()
        for i in range(2):
            Image.fromarray((rng.random((16, 16, 3)) * 255).astype(
                np.uint8)).save(tmp_path / cls / f"{i}.png")
    folder = training.PreloadedImageFolder(tmp_path, resize=16, crop=16)
    assert len(folder) == 4
    image, label = folder[0]
    assert image.shape == (3, 16, 16)
    assert label == 0
    assert folder[3][1] == 1
