"""Tests for the subject-model registry: rekeying and strict weight merge."""
import numpy as np
import pytest

import jax

from neuron_descriptions_tpu.exemplars import models
from neuron_descriptions_tpu.models import resnet


def _old_style_key(name: str) -> str:
    """Inverse of rekey_old_resnet152 for one torchvision-style key."""
    branch_inverse = {"conv1": "0", "bn1": "1", "conv2": "3", "bn2": "4",
                      "conv3": "6", "bn3": "7"}
    parts = name.split(".")
    if parts[0] == "conv1":
        return f"0.{parts[-1]}"
    if parts[0] == "bn1":
        return f"1.{parts[-1]}"
    if parts[0] == "fc":
        return f"10.1.{parts[-1]}"
    stage = int(parts[0][len("layer"):]) + 3
    block, child, leaf = parts[1], ".".join(parts[2:-1]), parts[-1]
    if child == "downsample.0":
        return f"{stage}.{block}.0.1.0.{leaf}"
    if child == "downsample.1":
        return f"{stage}.{block}.0.1.1.{leaf}"
    return f"{stage}.{block}.0.0.{branch_inverse[child]}.{leaf}"


def test_rekey_old_resnet152_covers_every_parameter():
    """Every torchvision-style resnet152 param must be reachable from an
    old-style key — rekey(inverse(key)) == key, for the full param set
    (reference checkpoint: src/deps/resnet152.py key layout)."""
    params = resnet.init(jax.random.PRNGKey(0), depth=152, num_classes=365)
    old_style = {_old_style_key(name): np.asarray(value)
                 for name, value in params.items()}
    assert len(old_style) == len(params)

    rekeyed = models.rekey_old_resnet152(old_style)
    assert set(rekeyed) == set(params)
    for name in params:
        assert rekeyed[name].shape == tuple(params[name].shape)


def test_rekey_old_resnet152_rejects_unknown():
    with pytest.raises(KeyError):
        models.rekey_old_resnet152({"99.0.weight": np.zeros((1,))})


def test_old_resnet152_factory_loads_rekeyed_checkpoint():
    params = resnet.init(jax.random.PRNGKey(1), depth=152, num_classes=365)
    old_style = {_old_style_key(name): np.asarray(value)
                 for name, value in params.items()}
    weights = models.rekey_old_resnet152(old_style)
    model = models._old_resnet152_factory(weights=weights)
    assert model.layers == ("0", "4", "5", "6", "7")
    np.testing.assert_array_equal(np.asarray(model.params["conv1.weight"]),
                                  np.asarray(params["conv1.weight"]))

    images = np.random.default_rng(0).random((1, 3, 64, 64)).astype(
        np.float32)
    _, taps = model(images)
    assert "0" in taps and "7" in taps
    np.testing.assert_array_equal(np.asarray(taps["0"]),
                                  np.asarray(taps["conv1"]))


def test_merge_weights_rejects_unexpected_key():
    params = {"a.weight": np.zeros((2, 2))}
    with pytest.raises(KeyError, match="unexpected"):
        models._merge_weights(params, {"a.weight": np.ones((2, 2)),
                                       "bogus": np.ones((1,))})


def test_merge_weights_rejects_zero_matches():
    params = {"a.weight": np.zeros((2, 2))}
    with pytest.raises(ValueError, match="matched no parameters"):
        models._merge_weights(params, {"x": np.ones((1,))}, strict=False)


def test_merge_weights_rejects_shape_mismatch():
    params = {"a.weight": np.zeros((2, 2))}
    with pytest.raises(ValueError, match="shape mismatch"):
        models._merge_weights(params, {"a.weight": np.ones((3,))})


def test_registry_has_reference_keys():
    configs = models.default_model_configs()
    for key in ("alexnet/imagenet", "alexnet/places365", "resnet18/imagenet",
                "resnet152/places365", "vgg16/places365",
                "dino_vits8/imagenet", "biggan/imagenet"):
        assert key in configs, key
    assert configs["resnet152/places365"].layers == ("0", "4", "5", "6", "7")
