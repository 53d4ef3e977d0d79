"""End-to-end exemplar computation tests.

Mirrors the reference's fixture strategy (reference:
tests/exemplars/compute_test.py:151-341): a tiny random conv subject model
over a 10-image dataset, with exhaustive filesystem-output assertions.
"""
import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuron_descriptions_tpu.exemplars import compute
from neuron_descriptions_tpu.ops import quantile as quantile_ops
from neuron_descriptions_tpu.ops import topk as topk_ops

N_IMAGES, UNITS, SIZE = 10, 3, 32
K = 4


class FakeImageDataset:
    """10 random images with deterministic content."""

    def __init__(self, n=N_IMAGES, size=SIZE):
        rng = np.random.default_rng(0)
        self.images = rng.uniform(0, 1, (n, 3, size, size)).astype(
            np.float32)
        self.labels = rng.integers(0, 3, n)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        return self.images[index], int(self.labels[index])

    @property
    def image_size(self):
        return SIZE

    normalize = "pt"  # images are already in [0, 1]


def tiny_conv_apply(params, images):
    """3->UNITS conv subject model with one tapped layer."""
    acts = jax.lax.conv_general_dilated(
        images, params["conv.weight"], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return acts.mean(axis=(1, 2, 3)), {"conv": acts}


@pytest.fixture(scope="module")
def subject():
    rng = np.random.default_rng(1)
    return {"conv.weight": jnp.asarray(
        rng.standard_normal((UNITS, 3, 3, 3)).astype(np.float32))}


@pytest.fixture()
def results(tmp_path, subject):
    dataset = FakeImageDataset()
    tk, qs = compute.discriminative(
        tiny_conv_apply, subject, dataset, layer="conv",
        results_dir=tmp_path / "results", viz_dir=tmp_path / "viz",
        k=K, output_size=SIZE, batch_size=4, num_workers=0,
        display_progress=False)
    return tmp_path, tk, qs


def test_artifact_tree(results):
    tmp_path, tk, qs = results
    rdir = tmp_path / "results" / "conv"

    images = np.load(rdir / "images.npy")
    masks = np.load(rdir / "masks.npy")
    assert images.shape == (UNITS, K, 3, SIZE, SIZE)
    assert images.dtype == np.uint8
    assert masks.shape == (UNITS, K, 1, SIZE, SIZE)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1}

    with (rdir / "ids.csv").open() as f:
        ids = [[int(v) for v in row] for row in csv.reader(f)]
    assert len(ids) == UNITS and all(len(row) == K for row in ids)
    assert all(0 <= v < N_IMAGES for row in ids for v in row)

    with (rdir / "activations.csv").open() as f:
        acts = [[float(v) for v in row] for row in csv.reader(f)]
    assert len(acts) == UNITS and all(len(row) == K for row in acts)
    # Activations sorted descending per unit.
    for row in acts:
        assert row == sorted(row, reverse=True)


def test_viz_tree(results):
    tmp_path, *_ = results
    vdir = tmp_path / "viz" / "conv"
    for unit in range(UNITS):
        unit_dir = vdir / f"unit_{unit}"
        assert (unit_dir / "+lightbox.html").exists()
        for rank in range(K):
            assert (unit_dir / f"image_{rank}.png").exists()


def test_topk_matches_brute_force(results, subject):
    _, tk, _ = results
    dataset = FakeImageDataset()
    acts = np.stack([
        np.asarray(tiny_conv_apply(subject,
                                   jnp.asarray(d[None]))[1]["conv"][0])
        for d in dataset.images
    ])  # (N, UNITS, H, W)
    pooled = acts.max(axis=(2, 3))
    want_ids = np.argsort(-pooled, axis=0)[:K].T
    _, got_ids = topk_ops.result(tk)
    np.testing.assert_array_equal(np.asarray(got_ids), want_ids)


def test_units_subset(tmp_path, subject):
    dataset = FakeImageDataset()
    compute.discriminative(
        tiny_conv_apply, subject, dataset, layer="conv",
        units=[2, 0], results_dir=tmp_path / "results",
        viz_dir=tmp_path / "viz", k=2, output_size=SIZE, batch_size=4,
        num_workers=0, display_progress=False, save_viz=False)
    rdir = tmp_path / "results" / "conv"
    units = np.load(rdir / "units.npy")
    np.testing.assert_array_equal(units, [0, 2])  # sorted
    assert np.load(rdir / "images.npy").shape[0] == 2


def test_tally_cache_roundtrip(tmp_path, subject):
    dataset = FakeImageDataset()
    cache = tmp_path / "tally.npz"
    kwargs = dict(layer="conv", results_dir=tmp_path / "results",
                  viz_dir=tmp_path / "viz", k=K, output_size=SIZE,
                  batch_size=4, num_workers=0, display_progress=False,
                  save_viz=False, tally_cache_file=cache)
    tk1, qs1 = compute.discriminative(tiny_conv_apply, subject, dataset,
                                      **kwargs)
    assert cache.exists()
    tk2, qs2 = compute.discriminative(tiny_conv_apply, subject, dataset,
                                      **kwargs)
    np.testing.assert_array_equal(np.asarray(tk1.values),
                                  np.asarray(tk2.values))
    np.testing.assert_array_equal(np.asarray(qs1.samples),
                                  np.asarray(qs2.samples))


def test_validation_errors(tmp_path, subject):
    dataset = FakeImageDataset()
    with pytest.raises(ValueError):
        compute.discriminative(tiny_conv_apply, subject, dataset,
                               layer="conv", k=0,
                               results_dir=tmp_path / "r")
    with pytest.raises(ValueError):
        compute.discriminative(tiny_conv_apply, subject, dataset,
                               layer="conv", quantile=2.0,
                               results_dir=tmp_path / "r")
    with pytest.raises(ValueError):
        compute.discriminative(tiny_conv_apply, subject, dataset,
                               layer="conv", units=[],
                               results_dir=tmp_path / "r")


def test_generative_pipeline(tmp_path):
    """Representation-in, image-out models: both hiddens and images flow."""
    rng = np.random.default_rng(3)

    class ZDataset:
        zs = rng.standard_normal((8, 4)).astype(np.float32)

        def __len__(self):
            return 8

        def __getitem__(self, i):
            return (self.zs[i],)

        image_size = 16
        normalize = "pt"

    w_img = jnp.asarray(rng.standard_normal((4, 3 * 16 * 16)).astype(
        np.float32))
    w_act = jnp.asarray(rng.standard_normal((4, UNITS * 8 * 8)).astype(
        np.float32))

    def gen_apply(params, z):
        images = jax.nn.sigmoid(z @ w_img).reshape(-1, 3, 16, 16)
        acts = (z @ w_act).reshape(-1, UNITS, 8, 8)
        return images, {"layer0": acts}

    compute.generative(
        gen_apply, {}, ZDataset(), layer="layer0",
        results_dir=tmp_path / "results", viz_dir=tmp_path / "viz",
        k=3, output_size=16, batch_size=4, num_workers=0,
        display_progress=False)
    rdir = tmp_path / "results" / "layer0"
    assert np.load(rdir / "images.npy").shape == (UNITS, 3, 3, 16, 16)
    assert np.load(rdir / "masks.npy").shape == (UNITS, 3, 1, 16, 16)


def test_masks_cache_roundtrip(tmp_path, subject):
    """Round-4 finding: masks_cache_file must actually cache the pass-2
    gather (reference caches it at src/exemplars/compute.py:90-94)."""
    dataset = FakeImageDataset()
    cache = tmp_path / "masks.npz"
    kwargs = dict(layer="conv", k=K, output_size=SIZE, batch_size=4,
                  num_workers=0, display_progress=False, save_viz=False,
                  masks_cache_file=cache)
    compute.discriminative(tiny_conv_apply, subject, dataset,
                           results_dir=tmp_path / "r1", **kwargs)
    assert cache.exists()

    # Second run must produce identical artifacts from the cache even with
    # a poisoned activations fn (proving the gather pass was skipped).
    def poisoned(params, images):
        out, taps = tiny_conv_apply(params, images)
        return out, {"conv": taps["conv"] * 0.0}

    compute.discriminative(poisoned, subject, dataset,
                           results_dir=tmp_path / "r2", **kwargs)
    a = np.load(tmp_path / "r1" / "conv" / "images.npy")
    b = np.load(tmp_path / "r2" / "conv" / "images.npy")
    np.testing.assert_array_equal(a, b)
    a = np.load(tmp_path / "r1" / "conv" / "masks.npy")
    b = np.load(tmp_path / "r2" / "conv" / "masks.npy")
    np.testing.assert_array_equal(a, b)


def test_biggan_generative_dissection(tmp_path):
    """Fixture-scale generative dissection with the real BigGAN-256 stack:
    (z, y) dataset -> generator forward with taps -> exemplar artifacts
    (reference flow: src/exemplars/compute.py:352-437 with SeqBigGAN)."""
    from neuron_descriptions_tpu.data import renormalize
    from neuron_descriptions_tpu.models import biggan

    params = biggan.init(jax.random.PRNGKey(0), n_classes=10)
    rng = np.random.default_rng(0)
    zs = rng.standard_normal((4, biggan.DIM_Z)).astype(np.float32)
    ys = rng.integers(0, 10, size=(4,)).astype(np.int64)

    class ZYDataset:
        def __getitem__(self, index):
            return zs[index], ys[index]

        def __len__(self):
            return len(zs)

    compute.generative(
        biggan.apply, params, ZYDataset(), layer="layer3",
        results_dir=tmp_path / "results", viz_dir=tmp_path / "viz",
        k=2, quantile=0.9, output_size=64, image_size=256, batch_size=2,
        num_workers=0, r=64, display_progress=False, save_viz=False,
        renormalizer=renormalize.renormalizer(target="byte"))

    rdir = tmp_path / "results" / "layer3"
    images = np.load(rdir / "images.npy")
    masks = np.load(rdir / "masks.npy")
    n_units = biggan.OUT_CH[3]
    assert images.shape == (n_units, 2, 3, 64, 64)
    assert masks.shape == (n_units, 2, 1, 64, 64)
    assert images.dtype == np.uint8


def test_discriminative_bf16_compute_dtype(tmp_path, subject):
    """Opt-in bf16 forward keeps the pipeline shape/contract intact and
    ranks top images consistently with f32 on well-separated data."""
    dataset = FakeImageDataset()
    kwargs = dict(layer="conv", k=2, output_size=SIZE, batch_size=4,
                  num_workers=0, display_progress=False, save_viz=False)
    tk32, _ = compute.discriminative(
        tiny_conv_apply, subject, dataset,
        results_dir=tmp_path / "f32", **kwargs)
    tk16, _ = compute.discriminative(
        tiny_conv_apply, subject, dataset, compute_dtype=jnp.bfloat16,
        results_dir=tmp_path / "bf16", **kwargs)
    assert tk16.values.dtype == jnp.float32  # stats stay f32
    np.testing.assert_array_equal(np.asarray(tk16.indices),
                                  np.asarray(tk32.indices))
    assert (tmp_path / "bf16" / "conv" / "images.npy").exists()


def test_caches_keyed_on_units(tmp_path, subject):
    """Review finding: a run with a different unit subset must not reuse
    caches written for another subset."""
    dataset = FakeImageDataset()
    tally = tmp_path / "tally.npz"
    masks = tmp_path / "masks.npz"
    kwargs = dict(layer="conv", k=2, output_size=SIZE, batch_size=4,
                  num_workers=0, display_progress=False, save_viz=False,
                  tally_cache_file=tally, masks_cache_file=masks)
    compute.discriminative(tiny_conv_apply, subject, dataset,
                           results_dir=tmp_path / "all", **kwargs)
    compute.discriminative(tiny_conv_apply, subject, dataset, units=[1],
                           results_dir=tmp_path / "sub", **kwargs)
    assert np.load(tmp_path / "all" / "conv" / "images.npy").shape[0] == UNITS
    assert np.load(tmp_path / "sub" / "conv" / "images.npy").shape[0] == 1


def test_mesh_with_units_subset(tmp_path, subject):
    """Sharded pass 1 composes with the units= closure wrappers."""
    import jax

    from neuron_descriptions_tpu.parallel import mesh as mesh_lib

    dataset = FakeImageDataset()
    mesh = mesh_lib.default_mesh(len(jax.devices()))
    kwargs = dict(layer="conv", units=[2, 0], k=2, output_size=SIZE,
                  batch_size=4, num_workers=0, display_progress=False,
                  save_viz=False)
    tk1, _ = compute.discriminative(tiny_conv_apply, subject, dataset,
                                    results_dir=tmp_path / "single",
                                    **kwargs)
    tkn, _ = compute.discriminative(tiny_conv_apply, subject, dataset,
                                    mesh=mesh,
                                    results_dir=tmp_path / "mesh", **kwargs)
    np.testing.assert_array_equal(np.asarray(tkn.indices),
                                  np.asarray(tk1.indices))
    a = np.load(tmp_path / "single" / "conv" / "images.npy")
    b = np.load(tmp_path / "mesh" / "conv" / "images.npy")
    np.testing.assert_array_equal(a, b)
