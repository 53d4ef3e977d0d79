"""Parity tests for the audit-zoo architectures.

Same strategy as tests/models/zoo_test.py: build a torch replica of the
published topology, load OUR randomly-initialized torch-keyed params into
it (verifying the naming contract), and compare logits + tapped
activations.
"""
import numpy as np
import pytest

import jax

from neuron_descriptions_tpu.models import (densenet, mobilenet, shufflenet,
                                            squeezenet)

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402
from torch.nn import functional as F  # noqa: E402


def to_torch_state(params):
    return {k: torch.from_numpy(np.asarray(v).copy())
            for k, v in params.items()}


# ---------------------------------------------------------------------------
# DenseNet-121.
# ---------------------------------------------------------------------------
class TorchDenseLayer(tnn.Module):

    def __init__(self, in_ch, growth=32, bn_size=4):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(in_ch)
        self.conv1 = tnn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                bias=False)

    def forward(self, x):
        h = self.conv1(F.relu(self.norm1(x)))
        return self.conv2(F.relu(self.norm2(h)))


class TorchDenseNet(tnn.Module):

    def __init__(self, blocks=(6, 12, 24, 16), num_classes=10):
        super().__init__()
        features = tnn.Module()
        features.conv0 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        features.norm0 = tnn.BatchNorm2d(64)
        channels = 64
        for bi, n_layers in enumerate(blocks, start=1):
            block = tnn.Module()
            for li in range(1, n_layers + 1):
                setattr(block, f"denselayer{li}",
                        TorchDenseLayer(channels))
                channels += 32
            setattr(features, f"denseblock{bi}", block)
            if bi < len(blocks):
                transition = tnn.Module()
                transition.norm = tnn.BatchNorm2d(channels)
                transition.conv = tnn.Conv2d(channels, channels // 2, 1,
                                             bias=False)
                setattr(features, f"transition{bi}", transition)
                channels //= 2
        features.norm5 = tnn.BatchNorm2d(channels)
        self.features = features
        self.blocks = blocks
        self.classifier = tnn.Linear(channels, num_classes)

    def forward(self, x):
        taps = {}
        h = self.features.conv0(x)
        taps["features.conv0"] = h
        h = F.max_pool2d(F.relu(self.features.norm0(h)), 3, 2, 1)
        for bi, n_layers in enumerate(self.blocks, start=1):
            block = getattr(self.features, f"denseblock{bi}")
            for li in range(1, n_layers + 1):
                new = getattr(block, f"denselayer{li}")(h)
                h = torch.cat([h, new], dim=1)
            taps[f"features.denseblock{bi}"] = h
            if bi < len(self.blocks):
                transition = getattr(self.features, f"transition{bi}")
                h = F.avg_pool2d(
                    transition.conv(F.relu(transition.norm(h))), 2, 2)
        h = F.relu(self.features.norm5(h))
        return self.classifier(h.mean(dim=(2, 3))), taps


def test_densenet121_parity(rng):
    params = densenet.init(jax.random.PRNGKey(0), depth=121, num_classes=10)
    replica = TorchDenseNet(num_classes=10)
    missing = replica.load_state_dict(to_torch_state(params), strict=False)
    assert all("num_batches_tracked" in k for k in missing.missing_keys)
    assert not missing.unexpected_keys
    replica.eval()

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    logits, taps = densenet.apply(params, x, depth=121)
    with torch.no_grad():
        t_logits, t_taps = replica(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=1e-3)
    for layer in densenet.LAYERS:
        np.testing.assert_allclose(np.asarray(taps[layer]),
                                   t_taps[layer].numpy(), atol=1e-3,
                                   err_msg=layer)


# ---------------------------------------------------------------------------
# MobileNetV2.
# ---------------------------------------------------------------------------
def test_mobilenet_v2_parity(rng):
    params = mobilenet.init(jax.random.PRNGKey(0), num_classes=10)

    # Torch replica assembled from the same plan.
    class ConvBN(tnn.Sequential):

        def __init__(self, i, o, k, stride=1, padding=0, groups=1):
            super().__init__(
                tnn.Conv2d(i, o, k, stride, padding, groups=groups,
                           bias=False),
                tnn.BatchNorm2d(o))

    class Inverted(tnn.Module):

        def __init__(self, i, o, expand, stride):
            super().__init__()
            hidden = i * expand
            layers = []
            if expand != 1:
                layers.append(ConvBN(i, hidden, 1))
            layers.append(ConvBN(hidden, hidden, 3, stride, 1,
                                 groups=hidden))
            layers.append(tnn.Conv2d(hidden, o, 1, bias=False))
            layers.append(tnn.BatchNorm2d(o))
            self.conv = tnn.Sequential(*layers)
            self.use_res = stride == 1 and i == o
            self.expand = expand

        def forward(self, x):
            h = x
            modules = list(self.conv)
            start = 0
            if self.expand != 1:
                h = F.relu6(modules[0](h))
                start = 1
            h = F.relu6(modules[start](h))
            h = modules[start + 2](modules[start + 1](h))
            return x + h if self.use_res else h

    features = [ConvBN(3, 32, 3, 2, 1)]
    for _index, expand, stride, in_ch, out_ch in mobilenet._block_plan():
        features.append(Inverted(in_ch, out_ch, expand, stride))
    features.append(ConvBN(320, 1280, 1))

    class TorchMobileNet(tnn.Module):

        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*features)
            self.classifier = tnn.Sequential(tnn.Dropout(0.0),
                                             tnn.Linear(1280, 10))

        def forward(self, x):
            taps = {}
            h = x
            for index, module in enumerate(self.features):
                if isinstance(module, ConvBN):
                    h = F.relu6(module(h))
                else:
                    h = module(h)
                taps[f"features.{index}"] = h
            return self.classifier(h.mean(dim=(2, 3))), taps

    replica = TorchMobileNet()
    missing = replica.load_state_dict(to_torch_state(params), strict=False)
    assert all("num_batches_tracked" in k for k in missing.missing_keys)
    assert not missing.unexpected_keys
    replica.eval()

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    logits, taps = mobilenet.apply(params, x)
    with torch.no_grad():
        t_logits, t_taps = replica(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=1e-3)
    for layer in mobilenet.LAYERS:
        np.testing.assert_allclose(np.asarray(taps[layer]),
                                   t_taps[layer].numpy(), atol=1e-3,
                                   err_msg=layer)


# ---------------------------------------------------------------------------
# ShuffleNetV2 x1.0.
# ---------------------------------------------------------------------------
class TorchShuffleUnit(tnn.Module):

    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        branch_ch = out_ch // 2
        self.stride = stride
        if stride == 2:
            self.branch1 = tnn.Sequential(
                tnn.Conv2d(in_ch, in_ch, 3, 2, 1, groups=in_ch, bias=False),
                tnn.BatchNorm2d(in_ch),
                tnn.Conv2d(in_ch, branch_ch, 1, bias=False),
                tnn.BatchNorm2d(branch_ch),
            )
        b2_in = in_ch if stride == 2 else branch_ch
        self.branch2 = tnn.Sequential(
            tnn.Conv2d(b2_in, branch_ch, 1, bias=False),
            tnn.BatchNorm2d(branch_ch),
            tnn.ReLU(),
            tnn.Conv2d(branch_ch, branch_ch, 3, stride, 1,
                       groups=branch_ch, bias=False),
            tnn.BatchNorm2d(branch_ch),
            tnn.Conv2d(branch_ch, branch_ch, 1, bias=False),
            tnn.BatchNorm2d(branch_ch),
        )

    def _branch2(self, x):
        h = F.relu(self.branch2[1](self.branch2[0](x)))
        h = self.branch2[4](self.branch2[3](h))
        return F.relu(self.branch2[6](self.branch2[5](h)))

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat([x1, self._branch2(x2)], dim=1)
        else:
            b1 = self.branch1[1](self.branch1[0](x))
            b1 = F.relu(self.branch1[3](self.branch1[2](b1)))
            out = torch.cat([b1, self._branch2(x)], dim=1)
        n, c, h, w = out.shape
        out = out.view(n, 2, c // 2, h, w).transpose(1, 2).reshape(
            n, c, h, w)
        return out


def test_shufflenet_v2_parity(rng):
    params = shufflenet.init(jax.random.PRNGKey(0), num_classes=10)

    class TorchShuffleNet(tnn.Module):

        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Sequential(
                tnn.Conv2d(3, 24, 3, 2, 1, bias=False),
                tnn.BatchNorm2d(24))
            in_ch = 24
            for stage_index, repeats in enumerate(
                    shufflenet.STAGE_REPEATS, start=2):
                out_ch = shufflenet.STAGE_CHANNELS[stage_index - 1]
                units = []
                for unit_index in range(repeats):
                    stride = 2 if unit_index == 0 else 1
                    units.append(TorchShuffleUnit(in_ch, out_ch, stride))
                    in_ch = out_ch
                setattr(self, f"stage{stage_index}", tnn.Sequential(*units))
            self.conv5 = tnn.Sequential(
                tnn.Conv2d(in_ch, 1024, 1, bias=False),
                tnn.BatchNorm2d(1024))
            self.fc = tnn.Linear(1024, 10)

        def forward(self, x):
            taps = {}
            h = F.relu(self.conv1[1](self.conv1[0](x)))
            taps["conv1"] = h
            h = F.max_pool2d(h, 3, 2, 1)
            for stage_index in (2, 3, 4):
                h = getattr(self, f"stage{stage_index}")(h)
                taps[f"stage{stage_index}"] = h
            h = F.relu(self.conv5[1](self.conv5[0](h)))
            taps["conv5"] = h
            return self.fc(h.mean(dim=(2, 3))), taps

    replica = TorchShuffleNet()
    missing = replica.load_state_dict(to_torch_state(params), strict=False)
    assert all("num_batches_tracked" in k for k in missing.missing_keys)
    assert not missing.unexpected_keys
    replica.eval()

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    logits, taps = shufflenet.apply(params, x)
    with torch.no_grad():
        t_logits, t_taps = replica(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=1e-3)
    for layer in shufflenet.LAYERS:
        np.testing.assert_allclose(np.asarray(taps[layer]),
                                   t_taps[layer].numpy(), atol=1e-3,
                                   err_msg=layer)


# ---------------------------------------------------------------------------
# SqueezeNet 1.0.
# ---------------------------------------------------------------------------
class TorchFire(tnn.Module):

    def __init__(self, in_ch, squeeze, e1, e3):
        super().__init__()
        self.squeeze = tnn.Conv2d(in_ch, squeeze, 1)
        self.expand1x1 = tnn.Conv2d(squeeze, e1, 1)
        self.expand3x3 = tnn.Conv2d(squeeze, e3, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(s)),
                          F.relu(self.expand3x3(s))], dim=1)


def test_squeezenet1_0_parity(rng):
    params = squeezenet.init(jax.random.PRNGKey(0), num_classes=10)

    class TorchSqueezeNet(tnn.Module):

        def __init__(self):
            super().__init__()
            modules = {0: tnn.Conv2d(3, 96, 7, 2)}
            in_ch = 96
            for index, (squeeze, e1, e3) in squeezenet.FIRES.items():
                modules[index] = TorchFire(in_ch, squeeze, e1, e3)
                in_ch = e1 + e3
            self.features = tnn.ModuleDict(
                {str(k): v for k, v in modules.items()})
            self.classifier = tnn.Sequential(
                tnn.Dropout(0.0), tnn.Conv2d(in_ch, 10, 1), tnn.ReLU())

        def forward(self, x):
            taps = {}
            h = self.features["0"](x)
            taps["features.0"] = h
            h = F.relu(h)
            for index in range(2, 13):
                if index in squeezenet.POOLS:
                    h = F.max_pool2d(h, 3, 2)
                elif index in squeezenet.FIRES:
                    h = self.features[str(index)](h)
                    taps[f"features.{index}"] = h
            h = self.classifier(h)
            return F.adaptive_avg_pool2d(h, 1)[:, :, 0, 0], taps

    replica = TorchSqueezeNet()
    state = to_torch_state(params)
    # ModuleDict path: features.0 -> features.0 — keys line up directly.
    missing = replica.load_state_dict(state, strict=False)
    assert not missing.missing_keys and not missing.unexpected_keys
    replica.eval()

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    logits, taps = squeezenet.apply(params, x)
    with torch.no_grad():
        t_logits, t_taps = replica(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=1e-3)
    for layer in squeezenet.LAYERS:
        np.testing.assert_allclose(np.asarray(taps[layer]),
                                   t_taps[layer].numpy(), atol=1e-3,
                                   err_msg=layer)
