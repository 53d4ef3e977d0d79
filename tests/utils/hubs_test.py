"""Tests for the hub registries (mirrors reference tests/utils/hubs_test)."""
import pickle

import numpy as np
import pytest

from neuron_descriptions_tpu.utils import env, hubs


@pytest.fixture(autouse=True)
def project_dirs(tmp_path, monkeypatch):
    monkeypatch.setenv(env.ENV_MODELS_DIR, str(tmp_path / "models"))
    monkeypatch.setenv(env.ENV_DATA_DIR, str(tmp_path / "data"))
    (tmp_path / "models").mkdir()
    (tmp_path / "data").mkdir()
    return tmp_path


def _write_weights(path, weights):
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("wb") as handle:
        pickle.dump(weights, handle)


def test_model_config_no_weights():
    config = hubs.ModelConfig(lambda **kw: ("model", kw), load_weights=False,
                              flag=1)
    model, kwargs = config.load()
    assert model == "model"
    assert kwargs == {"flag": 1}


def test_model_config_loads_weights(tmp_path):
    file = tmp_path / "m.pth"
    _write_weights(file, {"w": np.ones((2,))})

    captured = {}

    def factory(weights=None, **kwargs):
        captured["weights"] = weights
        return "model"

    config = hubs.ModelConfig(factory)
    assert config.load(path=file) == "model"
    np.testing.assert_array_equal(captured["weights"]["w"], [1, 1])


def test_model_config_transform_weights(tmp_path):
    file = tmp_path / "m.pth"
    _write_weights(file, {"state_dict": {"w": np.zeros((1,))}})
    captured = {}

    def factory(weights=None):
        captured["weights"] = weights
        return "model"

    config = hubs.ModelConfig(
        factory, transform_weights=lambda payload: payload["state_dict"])
    config.load(path=file)
    assert set(captured["weights"]) == {"w"}


def test_model_config_requires_path(tmp_path):
    file = tmp_path / "payload.pth"
    _write_weights(file, {"anything": 1})
    config = hubs.ModelConfig(lambda path, **kw: ("loaded", path),
                              requires_path=True, load_weights=False)
    with pytest.raises(ValueError):
        config.load()
    loaded, path = config.load(path=file)
    assert loaded == "loaded" and path == file


def test_model_config_missing_file(tmp_path):
    config = hubs.ModelConfig(lambda **kw: None)
    with pytest.raises(FileNotFoundError):
        config.load(path=tmp_path / "nope.pth")


def test_model_hub_default_path(project_dirs):
    file = project_dirs / "models" / "m.pth"
    _write_weights(file, {"w": np.ones((1,))})
    captured = {}

    def factory(weights=None):
        captured["weights"] = weights
        return "model"

    hub = hubs.ModelHub(m=hubs.ModelConfig(factory))
    assert hub.load("m") == "model"
    assert "w" in captured["weights"]


def test_model_hub_unknown_key():
    hub = hubs.ModelHub()
    with pytest.raises(KeyError):
        hub.load("nope")


def test_dataset_config_and_hub(project_dirs):
    root = project_dirs / "data" / "d"
    root.mkdir()
    (root / "x.txt").write_text("hi")

    config = hubs.DatasetConfig(lambda path, **kw: sorted(
        p.name for p in path.iterdir()))
    hub = hubs.DatasetHub(d=config)
    assert hub.load("d") == ["x.txt"]


def test_dataset_config_requires_path():
    config = hubs.DatasetConfig(lambda path=None: path)
    with pytest.raises(ValueError):
        config.load()
    no_path = hubs.DatasetConfig(lambda **kw: "ok", requires_path=False)
    assert no_path.load() == "ok"


def test_dataset_hub_load_all(project_dirs):
    for name in ("a", "b"):
        root = project_dirs / "data" / name
        root.mkdir()

    class Dataset:

        def __init__(self, path):
            self.name = path.name

        def __len__(self):
            return 2

        def __getitem__(self, index):
            return f"{self.name}-{index}"

    hub = hubs.DatasetHub(a=hubs.DatasetConfig(lambda p: Dataset(p)),
                          b=hubs.DatasetConfig(lambda p: Dataset(p)))
    combined = hub.load_all("a", "b")
    assert len(combined) == 4
    assert combined[0] == "a-0" and combined[3] == "b-1"


def test_concat_dataset():
    combined = hubs.ConcatDataset([1, 2], [3], [4, 5])
    assert len(combined) == 5
    assert [combined[i] for i in range(5)] == [1, 2, 3, 4, 5]
    assert combined[-1] == 5
    with pytest.raises(IndexError):
        combined[5]
    extended = combined + [6]
    assert len(extended) == 6


def test_download_file_offline(tmp_path):
    with pytest.raises(RuntimeError, match="could not download"):
        hubs.download_file("http://definitely-not-reachable.invalid/x",
                           tmp_path / "x")
