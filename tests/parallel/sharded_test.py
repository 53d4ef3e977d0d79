"""Sharded pass-1 fold == single-device scan, on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuron_descriptions_tpu.exemplars import compute as compute_mod
from neuron_descriptions_tpu.ops import quantile as quantile_ops
from neuron_descriptions_tpu.ops import topk as topk_ops
from neuron_descriptions_tpu.parallel import mesh as mesh_lib
from neuron_descriptions_tpu.parallel import sharded

# 3 units so the fake activation tensors double as RGB "images" for the
# pass-2 viz path in the end-to-end compute() comparison below.
N_UNITS = 3
K = 4
HW = 5


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return mesh_lib.default_mesh(8)


def _stats_fns():
    """A fake subject model: pooled = spatial max, flat = locations."""

    def tq(images):
        hiddens = jnp.asarray(images)  # (B, U, H, W)
        batch, units = hiddens.shape[:2]
        pooled = hiddens.reshape(batch, units, -1).max(axis=2)
        flat = jnp.moveaxis(hiddens, 1, -1).reshape(-1, units)
        return pooled, flat

    return tq


def test_sharded_fold_matches_single_device(mesh):
    # Hermetic RNG: the shared session fixture's stream shifts whenever
    # earlier tests change, and the sketch-accuracy bound below is
    # statistical — pin the data.
    data = np.random.default_rng(1234).normal(
        size=(50, N_UNITS, HW, HW)).astype(np.float32)
    tq = _stats_fns()

    # Single-device reference fold.
    tk1 = topk_ops.init(N_UNITS, K)
    qs1 = quantile_ops.init(N_UNITS, r=64)
    key = jax.random.PRNGKey(0)
    start = 0
    for i in range(0, len(data), 16):
        pooled, flat = tq(data[i:i + 16])
        tk1 = topk_ops.update(tk1, pooled, jnp.int32(start))
        qs1 = quantile_ops.update(qs1, flat, jax.random.fold_in(key, i))
        start += pooled.shape[0]

    # Sharded fold over the same batches.
    fold = sharded.make_sharded_fold(mesh)
    stats = sharded.init_sharded(mesh, N_UNITS, K, r=64)
    start = 0
    for i in range(0, len(data), 16):
        batch = data[i:i + 16]
        valid = len(batch)
        padded, _ = sharded.pad_rows(batch, 8)
        images = mesh_lib.shard_batch(padded, mesh)
        pooled, flat = tq(images)
        stats = fold(*stats, pooled, flat, jnp.int32(start),
                     jnp.int32(valid), jax.random.fold_in(key, i))
        start += valid
    tk8, qs8 = sharded.merge_sharded(stats)

    # Top-k is exact (ties are measure-zero with gaussian data).
    np.testing.assert_allclose(np.asarray(tk8.values), np.asarray(tk1.values),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tk8.indices),
                                  np.asarray(tk1.indices))
    assert int(tk8.count) == int(tk1.count) == 50

    # Quantile sketch: same population statistics (count + exact extremes);
    # the retained samples differ only by sampling randomness.
    assert int(qs8.count) == int(qs1.count) == 50 * HW * HW
    np.testing.assert_allclose(np.asarray(qs8.minima), np.asarray(qs1.minima))
    np.testing.assert_allclose(np.asarray(qs8.maxima), np.asarray(qs1.maxima))
    exact = np.quantile(data.transpose(0, 2, 3, 1).reshape(-1, N_UNITS),
                        0.9, axis=0)
    est = np.asarray(quantile_ops.quantiles(qs8, 0.9))
    # r=64 on 1250 samples at q=0.9: sampling std err ~= 0.21, so a
    # 3-sigma bound is ~0.65; anything tighter flakes by design.
    assert np.abs(est - exact).max() < 0.8


def test_compute_with_mesh_matches_unsharded(mesh, rng, tmp_path):
    data = rng.normal(size=(30, N_UNITS, HW, HW)).astype(np.float32)
    dataset = list(data)
    tq = _stats_fns()

    def acts(images):
        return jnp.asarray(images)

    common = dict(k=3, quantile=0.9, output_size=8, batch_size=16,
                  image_size=HW, num_workers=0, r=128,
                  display_progress=False, save_viz=False)
    # The fake "images" are activations; give compute a renormalizer so it
    # doesn't look for dataset metadata.
    from neuron_descriptions_tpu.data import renormalize
    renorm = renormalize.renormalizer("byte", "byte")

    tk1, _ = compute_mod.compute(
        tq, acts, dataset, results_dir=tmp_path / "single",
        renormalizer=renorm, **common)
    tk8, _ = compute_mod.compute(
        tq, acts, dataset, mesh=mesh, results_dir=tmp_path / "sharded",
        renormalizer=renorm, **common)

    np.testing.assert_allclose(np.asarray(tk8.values), np.asarray(tk1.values),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tk8.indices),
                                  np.asarray(tk1.indices))

    ids1 = np.loadtxt(tmp_path / "single" / "ids.csv", delimiter=",")
    ids8 = np.loadtxt(tmp_path / "sharded" / "ids.csv", delimiter=",")
    np.testing.assert_array_equal(ids1, ids8)


def test_padded_rows_are_ignored(mesh):
    """Padding must never enter topk indices or the sketch extremes."""
    fold = sharded.make_sharded_fold(mesh)
    stats = sharded.init_sharded(mesh, 2, 3, r=16)
    # 5 valid rows padded to 8; padding rows hold huge values that would
    # dominate if not masked.
    pooled = np.full((8, 2), 1e9, np.float32)
    pooled[:5] = np.arange(10, dtype=np.float32).reshape(5, 2)
    flat = np.full((8 * 4, 2), 1e9, np.float32)
    flat[:5 * 4] = 1.0
    pooled_s = mesh_lib.shard_batch(pooled, mesh)
    flat_s = mesh_lib.shard_batch(flat, mesh)
    stats = fold(*stats, pooled_s, flat_s, jnp.int32(0), jnp.int32(5),
                 jax.random.PRNGKey(1))
    tk, qs = sharded.merge_sharded(stats)
    assert np.asarray(tk.values).max() < 1e9
    assert set(np.asarray(tk.indices).ravel().tolist()) <= {0, 1, 2, 3, 4}
    assert int(tk.count) == 5
    assert int(qs.count) == 20
    assert np.asarray(qs.maxima).max() == 1.0
    est = np.asarray(quantile_ops.quantiles(qs, 0.99))
    np.testing.assert_allclose(est, 1.0)
