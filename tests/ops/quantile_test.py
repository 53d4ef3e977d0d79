"""Tests for the bottom-k reservoir quantile sketch (vs numpy exact)."""
import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu.ops import quantile

UNITS = 4


def test_exact_when_under_resolution():
    """With fewer samples than r, quantiles are exact order statistics."""
    rng = np.random.default_rng(0)
    data = rng.standard_normal((500, UNITS)).astype(np.float32)

    state = quantile.init(UNITS, r=1024)
    key = jax.random.PRNGKey(0)
    for i, start in enumerate(range(0, 500, 100)):
        state = quantile.update(state, jnp.asarray(data[start:start + 100]),
                                jax.random.fold_in(key, i))

    for q in (0.0, 0.25, 0.5, 0.9, 0.99, 1.0):
        want = np.quantile(data, q, axis=0)
        got = np.asarray(quantile.quantiles(state, q))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_approximate_at_scale():
    """Above resolution, the 0.99 quantile lands within sketch tolerance."""
    rng = np.random.default_rng(1)
    n = 200_000
    data = rng.standard_normal((n, UNITS)).astype(np.float32)

    state = quantile.init(UNITS, r=4096)
    key = jax.random.PRNGKey(7)
    step = 10_000
    for i, start in enumerate(range(0, n, step)):
        state = quantile.update(state, jnp.asarray(data[start:start + step]),
                                jax.random.fold_in(key, i))

    got = np.asarray(quantile.quantiles(state, 0.99))
    # Compare in rank space: the fraction of data below the estimate should
    # be 0.99 within ~4 standard errors of sqrt(q(1-q)/r) ≈ 0.0016.
    for unit in range(UNITS):
        frac = (data[:, unit] < got[unit]).mean()
        assert abs(frac - 0.99) < 0.008, (unit, frac)

    # Extremes remain exact.
    np.testing.assert_allclose(np.asarray(quantile.quantiles(state, 1.0)),
                               data.max(axis=0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(quantile.quantiles(state, 0.0)),
                               data.min(axis=0), rtol=1e-6)


def test_merge_statistics():
    """Merged shard sketches estimate like a single-pass sketch."""
    rng = np.random.default_rng(2)
    n = 100_000
    data = rng.standard_normal((n, UNITS)).astype(np.float32)

    key = jax.random.PRNGKey(3)
    shards = []
    n_dev = 4
    per = n // n_dev
    for d in range(n_dev):
        s = quantile.init(UNITS, r=4096)
        s = quantile.update(s, jnp.asarray(data[d * per:(d + 1) * per]),
                            jax.random.fold_in(key, d))
        shards.append(s)

    merged = shards[0]
    for s in shards[1:]:
        merged = quantile.merge(merged, s)
    assert int(merged.count) == n

    got = np.asarray(quantile.quantiles(merged, 0.99))
    for unit in range(UNITS):
        frac = (data[:, unit] < got[unit]).mean()
        assert abs(frac - 0.99) < 0.008, (unit, frac)


def test_multi_quantile_shape_and_monotonicity():
    rng = np.random.default_rng(4)
    data = rng.standard_normal((5000, UNITS)).astype(np.float32)
    state = quantile.init(UNITS, r=2048)
    state = quantile.update(state, jnp.asarray(data), jax.random.PRNGKey(0))

    qs = jnp.asarray([0.01, 0.5, 0.99])
    got = np.asarray(quantile.quantiles(state, qs))
    assert got.shape == (UNITS, 3)
    assert np.all(np.diff(got, axis=1) >= 0)


def test_update_is_jit_and_scan_safe():
    rng = np.random.default_rng(5)
    data = rng.standard_normal((4, 256, UNITS)).astype(np.float32)

    @jax.jit
    def run(batches):
        def body(carry, xs):
            state, key = carry
            key, sub = jax.random.split(key)
            return (quantile.update(state, xs, sub), key), None

        init = (quantile.init(UNITS, r=512), jax.random.PRNGKey(0))
        (state, _), _ = jax.lax.scan(body, init, batches)
        return state

    state = run(jnp.asarray(data))
    assert int(state.count) == 4 * 256
    flat = data.reshape(-1, UNITS)
    got = np.asarray(quantile.quantiles(state, 0.5))
    want = np.quantile(flat, 0.5, axis=0)
    np.testing.assert_allclose(got, want, atol=0.15)
