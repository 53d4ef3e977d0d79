"""Tests for the streaming top-k accumulator (vs numpy brute force)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuron_descriptions_tpu.ops import topk


UNITS, K = 7, 5


def brute_topk(data: np.ndarray, k: int, largest: bool = True):
    """Reference result: per-unit top-k over (samples, units) data."""
    order = np.argsort(-data if largest else data, axis=0, kind="stable")
    idx = order[:k].T  # (units, k)
    vals = np.take_along_axis(data.T, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("largest", [True, False])
def test_update_matches_brute_force(largest):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((64, UNITS)).astype(np.float32)

    state = topk.init(UNITS, K, largest=largest)
    for start in range(0, 64, 16):
        state = topk.update(state, jnp.asarray(data[start:start + 16]),
                            jnp.int32(start), largest=largest)

    want_vals, want_idx = brute_topk(data, K, largest=largest)
    got_vals, got_idx = topk.result(state)
    np.testing.assert_allclose(np.asarray(got_vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
    assert int(state.count) == 64


def test_update_fewer_samples_than_k():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((3, UNITS)).astype(np.float32)
    state = topk.init(UNITS, K)
    state = topk.update(state, jnp.asarray(data), jnp.int32(0))
    vals, idx = topk.result(state)
    vals, idx = np.asarray(vals), np.asarray(idx)
    # First 3 slots real, rest unfilled.
    assert np.all(np.isfinite(vals[:, :3]))
    assert np.all(np.isneginf(vals[:, 3:]))
    assert np.all(idx[:, 3:] == -1)


def test_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((40, UNITS)).astype(np.float32)

    single = topk.init(UNITS, K)
    single = topk.update(single, jnp.asarray(data), jnp.int32(0))

    a = topk.init(UNITS, K)
    a = topk.update(a, jnp.asarray(data[:25]), jnp.int32(0))
    b = topk.init(UNITS, K)
    b = topk.update(b, jnp.asarray(data[25:]), jnp.int32(25))
    merged = topk.merge(a, b)

    np.testing.assert_allclose(np.asarray(merged.values),
                               np.asarray(single.values), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(merged.indices),
                                  np.asarray(single.indices))
    assert int(merged.count) == 40


def test_update_is_jit_and_scan_safe():
    rng = np.random.default_rng(4)
    data = rng.standard_normal((32, UNITS)).astype(np.float32)
    batches = jnp.asarray(data).reshape(4, 8, UNITS)

    @jax.jit
    def run(batches):
        def body(state, xs):
            batch, start = xs
            return topk.update(state, batch, start), None

        starts = jnp.arange(4, dtype=jnp.int32) * 8
        state, _ = jax.lax.scan(body, topk.init(UNITS, K), (batches, starts))
        return state

    state = run(batches)
    want_vals, want_idx = brute_topk(data, K)
    np.testing.assert_allclose(np.asarray(state.values), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(state.indices), want_idx)


def test_sharded_merge_on_device_mesh():
    """Per-device partial states tree-reduce to the global answer."""
    n_dev = jax.device_count()
    assert n_dev >= 2, "conftest should provide 8 virtual devices"
    rng = np.random.default_rng(5)
    data = rng.standard_normal((n_dev * 8, UNITS)).astype(np.float32)

    partials = []
    for d in range(n_dev):
        s = topk.init(UNITS, K)
        s = topk.update(s, jnp.asarray(data[d * 8:(d + 1) * 8]),
                        jnp.int32(d * 8))
        partials.append(s)

    merged = partials[0]
    for s in partials[1:]:
        merged = topk.merge(merged, s)

    want_vals, want_idx = brute_topk(data, K)
    np.testing.assert_allclose(np.asarray(merged.values), want_vals,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(merged.indices), want_idx)
