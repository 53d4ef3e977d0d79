"""PyramidConvEncoder tests: torch pooling parity + contract checks.

The parity replica reimplements the reference pyramid pooling in torch
(reference: src/milan/encoders.py:286-320 — per-level bilinear mask
downsample with align_corners=False, sum-normalize with all-zero guard,
mask-weighted spatial sum, concat) on top of the zoo ResNet-18 replica used
by tests/models/zoo_test.py, and loads OUR parameters into it.
"""
import numpy as np
import pytest

from neuron_descriptions_tpu.milan import encoders

from tests.models.zoo_test import TorchResNet18, to_torch_state

torch = pytest.importorskip("torch")
from torch.nn import functional as F  # noqa: E402


@pytest.fixture(scope="module")
def encoder():
    return encoders.PyramidConvEncoder(config="resnet18")


def test_feature_shape(encoder):
    assert encoder.feature_shape == (1024,)


def test_forward_parity_with_torch(encoder, rng):
    images = rng.random((2, 3, 64, 64)).astype(np.float32)
    masks = (rng.random((2, 1, 64, 64)) > 0.5).astype(np.float32)

    ours = np.asarray(encoder(images, masks))

    replica = TorchResNet18(num_classes=1000)
    replica.load_state_dict(to_torch_state(encoder.params), strict=False)
    replica.eval()

    t_images = torch.from_numpy(images)
    t_images = (t_images - torch.as_tensor(np.asarray(encoder.mean))) / \
        torch.as_tensor(np.asarray(encoder.std))
    with torch.no_grad():
        _, taps = replica(t_images)
        t_masks = torch.from_numpy(masks)
        pooled = []
        for layer in ("conv1", "layer1", "layer2", "layer3", "layer4"):
            fs = taps[layer]
            ms = F.interpolate(t_masks, size=fs.shape[-2:], mode="bilinear",
                               align_corners=False)
            zeros = torch.zeros_like(ms)
            valid = ~ms.isclose(zeros).all(dim=-1).all(dim=-1).view(-1)
            indices = valid.nonzero().squeeze()
            ms[indices] /= ms[indices].sum(dim=(-1, -2), keepdim=True)
            pooled.append(fs.mul(ms).sum(dim=(-1, -2)))
        expected = torch.cat(pooled, dim=-1).numpy()

    np.testing.assert_allclose(ours, expected, atol=1e-3, rtol=1e-4)


def test_no_mask_equals_uniform(encoder, rng):
    images = rng.random((2, 3, 32, 32)).astype(np.float32)
    ones = np.ones((2, 1, 32, 32), np.float32)
    np.testing.assert_allclose(np.asarray(encoder(images)),
                               np.asarray(encoder(images, ones)), atol=1e-5)


def test_all_zero_mask_is_finite(encoder, rng):
    images = rng.random((2, 3, 32, 32)).astype(np.float32)
    masks = np.zeros((2, 1, 32, 32), np.float32)
    features = np.asarray(encoder(images, masks))
    assert np.all(np.isfinite(features))
    np.testing.assert_allclose(features, 0.0, atol=1e-5)


def test_map(encoder, annotated_dataset):
    features = encoder.map(annotated_dataset, image_index=2, mask_index=3)
    assert features.shape == (len(annotated_dataset), 5, 1024)


def test_state_dict_round_trip(encoder, rng):
    state = encoder.state_dict()
    # Reference nesting: Decoder payloads hold encoder.encoder.model.* keys,
    # so at encoder level the backbone lives under encoder.model.*.
    assert "encoder.model.conv1.weight" in state
    assert "mean" in state
    rebuilt = encoders.PyramidConvEncoder(config="resnet18", seed=99)
    rebuilt.load_state_dict(state)
    images = rng.random((1, 3, 32, 32)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(encoder(images)),
                               np.asarray(rebuilt(images)), atol=1e-5)


def test_load_state_dict_rejects_unknown(encoder):
    with pytest.raises(KeyError):
        encoder.load_state_dict(
            {"encoder.model.bogus.weight": np.zeros((1,))})


def test_serialization_properties(encoder):
    payload = encoder.serialize(state_dict=False)
    assert payload["properties"]["config"] == "resnet18"
    assert payload["properties"]["pretrained"] is True
    assert "state_dict" not in payload


def test_parse_and_key(encoder):
    assert encoders.key(encoder) == "PyramidConvEncoder"
    assert encoders.parse("PyramidConvEncoder") is encoders.PyramidConvEncoder
    assert encoders.parse("SpatialConvEncoder") is encoders.SpatialConvEncoder


def test_factory():
    enc = encoders.encoder("pyramid", config="resnet18")
    assert isinstance(enc, encoders.PyramidConvEncoder)
    spatial = encoders.encoder("spatial")
    assert spatial.feature_shape == (49, 512)


def test_spatial_encoder_shape(rng):
    enc = encoders.SpatialConvEncoder()
    images = rng.random((2, 3, 224, 224)).astype(np.float32)
    features = np.asarray(enc(images))
    assert features.shape == (2, 49, 512)


def test_unsupported_config():
    with pytest.raises(ValueError):
        encoders.PyramidConvEncoder(config="vgg16")
