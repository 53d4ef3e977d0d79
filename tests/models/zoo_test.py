"""End-to-end architecture parity tests.

Strategy: build a torch replica of each architecture (standard torchvision
topology, written here from the published architecture), load OUR randomly
initialized torch-keyed params into it via ``load_state_dict`` — which
verifies the parameter naming contract exactly — and compare forward
outputs and tapped activations.
"""
import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from neuron_descriptions_tpu.models import alexnet, resnet, vgg, vit  # noqa: E402


def to_torch_state(params):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.bn1(self.conv1(x)).relu()
        out = self.bn2(self.conv2(out))
        return (out + idt).relu()


class TorchResNet18(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for i, w in enumerate(widths):
            blocks = []
            for b in range(2):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(TorchBasicBlock(cin, w, stride))
                cin = w
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        taps = {}
        h = self.conv1(x)
        taps["conv1"] = h
        h = self.maxpool(self.bn1(h).relu())
        for i in range(1, 5):
            h = getattr(self, f"layer{i}")(h)
            taps[f"layer{i}"] = h
        pooled = h.mean(dim=(2, 3))
        return self.fc(pooled), taps


def test_resnet18_parity():
    params = resnet.init(jax.random.PRNGKey(0), depth=18, num_classes=10)
    model = TorchResNet18(num_classes=10)
    missing = model.load_state_dict(
        {k: v for k, v in to_torch_state(params).items()}, strict=False)
    # Only num_batches_tracked buffers may be missing.
    assert all("num_batches_tracked" in k for k in missing.missing_keys)
    assert not missing.unexpected_keys
    model.eval()

    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        want_logits, want_taps = model(torch.from_numpy(x))

    got_logits, got_taps = resnet.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x),
        depth=18)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=1e-3)
    for name in ("conv1", "layer1", "layer2", "layer3", "layer4"):
        np.testing.assert_allclose(np.asarray(got_taps[name]),
                                   want_taps[name].numpy(), atol=1e-3)


def test_resnet50_shapes():
    params = resnet.init(jax.random.PRNGKey(1), depth=50, num_classes=7)
    x = jnp.zeros((1, 3, 64, 64))
    logits, taps = resnet.apply(params, x, depth=50)
    assert logits.shape == (1, 7)
    assert taps["conv1"].shape == (1, 64, 32, 32)
    assert taps["layer4"].shape == (1, 2048, 2, 2)


class TorchAlexNet(tnn.Module):
    """torchvision AlexNet topology."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(), tnn.MaxPool2d(3, 2))
        self.avgpool = tnn.AdaptiveAvgPool2d(6)
        self.classifier = tnn.Sequential(
            tnn.Dropout(), tnn.Linear(256 * 36, 4096), tnn.ReLU(),
            tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(),
            tnn.Linear(4096, num_classes))

    def forward(self, x):
        taps = {}
        h = x
        for i, mod in enumerate(self.features):
            h = mod(h)
            if isinstance(mod, tnn.Conv2d):
                taps[f"features.{i}"] = h
        h = self.avgpool(h).flatten(1)
        return self.classifier(h), taps


def test_alexnet_parity():
    params = alexnet.init(jax.random.PRNGKey(2), num_classes=10)
    model = TorchAlexNet(num_classes=10)
    result = model.load_state_dict(to_torch_state(params), strict=True)
    assert not result.missing_keys and not result.unexpected_keys
    model.eval()

    x = np.random.default_rng(1).standard_normal((2, 3, 224, 224)).astype(
        np.float32)
    with torch.no_grad():
        want_logits, want_taps = model(torch.from_numpy(x))

    got_logits, got_taps = alexnet.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-3)
    for idx in (0, 3, 6, 8, 10):
        np.testing.assert_allclose(np.asarray(got_taps[f"features.{idx}"]),
                                   want_taps[f"features.{idx}"].numpy(),
                                   atol=2e-3)


def test_caffe_alexnet_places365_shapes():
    params = alexnet.init_places365(jax.random.PRNGKey(3))
    x = jnp.zeros((1, 3, 227, 227))
    logits, taps = alexnet.apply_places365(params, x)
    assert logits.shape == (1, 365)
    assert taps["conv1"].shape == (1, 96, 55, 55)
    assert taps["conv5"].shape == (1, 256, 13, 13)


class TorchVGG(tnn.Module):
    def __init__(self, plan, num_classes=10):
        super().__init__()
        layers, cin = [], 3
        for entry in plan:
            if entry == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, entry, 3, 1, 1), tnn.ReLU()]
                cin = entry
        self.features = tnn.Sequential(*layers)
        self.avgpool = tnn.AdaptiveAvgPool2d(7)
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 49, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, num_classes))

    def forward(self, x):
        taps = {}
        h = x
        for i, mod in enumerate(self.features):
            h = mod(h)
            if isinstance(mod, tnn.Conv2d):
                taps[f"features.{i}"] = h
        h = self.avgpool(h).flatten(1)
        return self.classifier(h), taps


def test_vgg11_parity():
    params = vgg.init(jax.random.PRNGKey(4), depth=11, num_classes=10)
    model = TorchVGG(vgg.CONFIGS[11], num_classes=10)
    result = model.load_state_dict(to_torch_state(params), strict=True)
    assert not result.missing_keys and not result.unexpected_keys
    model.eval()

    x = np.random.default_rng(2).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        want_logits, want_taps = model(torch.from_numpy(x))

    got_logits, got_taps = vgg.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x),
        depth=11)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=2e-3)
    for name in vgg.LAYERS[11]:
        np.testing.assert_allclose(np.asarray(got_taps[name]),
                                   want_taps[name].numpy(), atol=2e-3)


def test_vit_shapes_and_taps():
    params = vit.init(jax.random.PRNGKey(5), image_size=32)
    x = jnp.zeros((2, 3, 32, 32))
    cls_out, taps = vit.apply(params, x)
    assert cls_out.shape == (2, 384)
    assert len(taps) == 12
    # 32/8 = 4x4 = 16 patches + CLS.
    assert taps["blocks.0.mlp.fc1"].shape == (2, 17, 1536)
    assert np.isfinite(np.asarray(cls_out)).all()
