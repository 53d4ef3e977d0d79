"""Shared fixtures for milan tests: small indexer, fake encoder, fake data.

Mirrors the reference fixture strategy (reference: tests/milan/conftest.py —
a FakeEncoder decouples decoder tests from torchvision weights).
"""
import numpy as np
import pytest

from neuron_descriptions_tpu.milan import encoders
from neuron_descriptions_tpu.utils import lang

FEATURE_SIZE = 16
K = 5
N_UNITS = 6

ANNOTATIONS = (
    "the dog runs fast",
    "a blue sky with clouds",
    "red car on the road",
    "green grass near water",
    "dog ears and fur",
    "sky over the water",
)


class FakeEncoder(encoders.Encoder):
    """Deterministic projection 'featurizer' with a real param so that
    state-dict round trips can be exercised."""

    feature_shape = (FEATURE_SIZE,)

    def __init__(self, state_dict=None, seed=0):
        rng = np.random.default_rng(seed)
        self.weight = rng.normal(size=(3, FEATURE_SIZE)).astype(np.float32)
        if state_dict is not None:
            self.load_state_dict(state_dict)

    def forward(self, images, masks=None, **kwargs):
        import jax.numpy as jnp
        images = jnp.asarray(images, jnp.float32)
        pooled = images.mean(axis=(-1, -2))  # (batch, 3)
        if masks is not None:
            masks = jnp.asarray(masks, jnp.float32)
            pooled = pooled + masks.mean(axis=(-1, -2))
        return pooled @ jnp.asarray(self.weight)

    def properties(self):
        return {}

    def state_dict(self):
        return {"weight": np.asarray(self.weight)}

    def load_state_dict(self, state_dict):
        self.weight = np.asarray(state_dict["weight"])


@pytest.fixture
def tokenize():
    return lang.tokenizer(lemmatize=False, ignore_stop=False,
                          ignore_punct=False)


@pytest.fixture
def indexer(tokenize):
    return lang.indexer(ANNOTATIONS, tokenize=tokenize, start=True,
                        stop=True, pad=True, unk=True)


@pytest.fixture
def fake_encoder():
    return FakeEncoder()


class FakeAnnotatedDataset:
    """Samples follow the AnnotatedTopImagesDataset layout:
    (layer, unit, images, masks, annotations)."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self.samples = []
        for unit in range(N_UNITS):
            images = rng.random((K, 3, 8, 8)).astype(np.float32)
            masks = (rng.random((K, 1, 8, 8)) > 0.5).astype(np.float32)
            annotations = (ANNOTATIONS[unit],
                           ANNOTATIONS[(unit + 1) % N_UNITS])
            self.samples.append(("layer0", unit, images, masks, annotations))

    def __getitem__(self, index):
        return self.samples[index]

    def __len__(self):
        return len(self.samples)


@pytest.fixture
def annotated_dataset():
    return FakeAnnotatedDataset()
