"""Tests for viz helpers (wandb-optional image records + HTML export)."""
import numpy as np
import pytest

from neuron_descriptions_tpu.milannotations.datasets import (
    AnnotatedTopImages, TopImages)
from neuron_descriptions_tpu.utils import viz


def _sample(unit, annotated=True):
    rng = np.random.default_rng(unit)
    images = rng.random((4, 3, 8, 8)).astype(np.float32)
    masks = (rng.random((4, 1, 8, 8)) > 0.5).astype(np.float32)
    if annotated:
        return AnnotatedTopImages("layer0", unit, images, masks,
                                  (f"thing {unit}",))
    return TopImages("layer0", unit, images, masks)


class Dataset:

    def __init__(self, n=4, annotated=True):
        self.samples = [_sample(i, annotated) for i in range(n)]

    def __getitem__(self, index):
        return self.samples[index]

    def __len__(self):
        return len(self.samples)


def test_kwargs_to_str():
    assert viz.kwargs_to_str(a=1, b=0.5, c="x") == 'a=1, b=0.50, c="x"'


def test_wandb_images_without_wandb():
    dataset = Dataset()
    records = viz.random_neuron_wandb_images(
        dataset, captions=[f"cap {i}" for i in range(4)], k=2,
        condition="test")
    assert len(records) == 2
    for record in records:
        assert isinstance(record, viz.CaptionedImage)
        assert 'condition="test"' in record.caption
        assert 'layer="layer0"' in record.caption


def test_wandb_images_validates_lengths():
    with pytest.raises(ValueError):
        viz.wandb_images([], ["caption"])


def test_generate_html(tmp_path):
    dataset = Dataset()
    viz.generate_html(dataset, tmp_path,
                      predictions=[f"predicted {i}" for i in range(4)],
                      get_base_url=lambda *_: "https://x.test/images")
    html = (tmp_path / "index.html").read_text()
    assert "layer0-0" in html
    assert "predicted 2" in html
    assert "thing 1" in html  # ground-truth annotations included
    assert "https://x.test/images/top_images_0_0.png" in html
    # Images saved individually (4 units x 4 top images).
    assert len(list(tmp_path.glob("top_images_*.png"))) == 16


def test_generate_html_grid_images(tmp_path):
    dataset = Dataset(annotated=False)
    viz.generate_html(dataset, tmp_path, grid_images=True, include_gt=False)
    assert len(list(tmp_path.glob("top_images_*.png"))) == 4


def test_generate_html_validates_predictions(tmp_path):
    with pytest.raises(ValueError):
        viz.generate_html(Dataset(), tmp_path, predictions=["too few"])


def test_generate_html_prediction_table(tmp_path):
    dataset = Dataset(n=1)
    viz.generate_html(dataset, tmp_path,
                      predictions=[{"milan": "a dog", "baseline": "dog"}],
                      save_images=False)
    html = (tmp_path / "index.html").read_text()
    assert "<table>" in html and "baseline" in html
