"""BigGAN parity and pipeline tests.

Primitive-level parity replicates the pretorched layers in torch at small
sizes (reference: src/deps/pretorched/layers/norm.py:27-101,337-395,
layers/attention.py:27-44) and compares against our pure functions loaded
with the same parameters — covering the SN power-iteration, class-
conditional BN, GBlock, and SA-GAN attention numerics that checkpoint
parity hinges on.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neuron_descriptions_tpu.models import biggan

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_sn_weight(weight: np.ndarray, u: np.ndarray,
                     eps: float = biggan.SN_EPS) -> np.ndarray:
    """The reference power_iteration at inference (update=False)."""
    w = torch.from_numpy(weight)
    w_mat = w.view(w.shape[0], -1)
    u_t = torch.from_numpy(u)
    v = F.normalize(torch.matmul(u_t, w_mat), eps=eps)
    u_new = F.normalize(torch.matmul(v, w_mat.t()), eps=eps)
    sv = torch.squeeze(torch.matmul(torch.matmul(v, w_mat.t()), u_new.t()))
    return (w / sv).numpy()


def test_sn_weight_matches_reference_power_iteration(rng):
    weight = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
    u = rng.normal(size=(1, 6)).astype(np.float32)
    params = {"w.weight": jnp.asarray(weight), "w.u0": jnp.asarray(u)}
    ours = np.asarray(biggan._sn_weight(params, "w"))
    expected = _torch_sn_weight(weight, u)
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def _make_ccbn_params(rng, channels, cond):
    params = {}
    for part in ("gain", "bias"):
        params[f"bn.{part}.weight"] = jnp.asarray(
            rng.normal(size=(channels, cond)).astype(np.float32) * 0.1)
        params[f"bn.{part}.u0"] = jnp.asarray(
            rng.normal(size=(1, channels)).astype(np.float32))
    params["bn.stored_mean"] = jnp.asarray(
        rng.normal(size=(channels,)).astype(np.float32) * 0.1)
    params["bn.stored_var"] = jnp.asarray(
        rng.random(channels).astype(np.float32) + 0.5)
    return params


def test_ccbn_matches_torch(rng):
    channels, cond = 8, 5
    params = _make_ccbn_params(rng, channels, cond)
    x = rng.normal(size=(2, channels, 4, 4)).astype(np.float32)
    y = rng.normal(size=(2, cond)).astype(np.float32)

    ours = np.asarray(biggan._ccbn(params, "bn", jnp.asarray(x),
                                   jnp.asarray(y)))

    # Torch: eval-mode F.batch_norm (no affine) then (1+gain(y)), bias(y)
    # with SN linears (reference: norm.py:372-395).
    def sn_linear(part, inp):
        w = _torch_sn_weight(np.asarray(params[f"bn.{part}.weight"]),
                             np.asarray(params[f"bn.{part}.u0"]))
        return torch.from_numpy(inp) @ torch.from_numpy(w).t()

    gain = (1 + sn_linear("gain", y)).view(2, -1, 1, 1)
    bias = sn_linear("bias", y).view(2, -1, 1, 1)
    out = F.batch_norm(torch.from_numpy(x),
                       torch.from_numpy(np.asarray(params["bn.stored_mean"])),
                       torch.from_numpy(np.asarray(params["bn.stored_var"])),
                       None, None, False, 0.1, biggan.BN_EPS)
    expected = (out * gain + bias).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_attention_matches_torch(rng):
    ch, size = 16, 8
    params = {}
    for name, out_ch, in_ch in (("theta", ch // 8, ch), ("phi", ch // 8, ch),
                                ("g", ch // 2, ch), ("o", ch, ch // 2)):
        params[f"attn.{name}.weight"] = jnp.asarray(
            rng.normal(size=(out_ch, in_ch, 1, 1)).astype(np.float32) * 0.2)
        params[f"attn.{name}.u0"] = jnp.asarray(
            rng.normal(size=(1, out_ch)).astype(np.float32))
    params["attn.gamma"] = jnp.asarray(np.float32(0.7))
    x = rng.normal(size=(2, ch, size, size)).astype(np.float32)

    ours = np.asarray(biggan._attention(params, "attn", jnp.asarray(x)))

    def conv(name, inp):
        w = _torch_sn_weight(np.asarray(params[f"attn.{name}.weight"]),
                             np.asarray(params[f"attn.{name}.u0"]))
        return F.conv2d(inp, torch.from_numpy(w))

    xt = torch.from_numpy(x)
    theta = conv("theta", xt).view(2, ch // 8, size * size)
    phi = F.max_pool2d(conv("phi", xt), [2, 2]).view(2, ch // 8, -1)
    g = F.max_pool2d(conv("g", xt), [2, 2]).view(2, ch // 2, -1)
    beta = F.softmax(torch.bmm(theta.transpose(1, 2), phi), -1)
    o = conv("o", torch.bmm(g, beta.transpose(1, 2)).view(
        2, ch // 2, size, size))
    expected = (0.7 * o + xt).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_gblock_matches_torch(rng):
    in_ch, out_ch, cond, size = 8, 6, 5, 4
    params = {}
    for bn in ("bn1", "bn2"):
        channels = in_ch if bn == "bn1" else out_ch
        for name, value in _make_ccbn_params(rng, channels, cond).items():
            params[f'blk.{bn}.{name[len("bn."):]}'] = value
    for conv, (o, i, k) in (("conv1", (out_ch, in_ch, 3)),
                            ("conv2", (out_ch, out_ch, 3)),
                            ("conv_sc", (out_ch, in_ch, 1))):
        params[f"blk.{conv}.weight"] = jnp.asarray(
            rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.2)
        params[f"blk.{conv}.bias"] = jnp.asarray(
            rng.normal(size=(o,)).astype(np.float32) * 0.1)
        params[f"blk.{conv}.u0"] = jnp.asarray(
            rng.normal(size=(1, o)).astype(np.float32))
    x = rng.normal(size=(2, in_ch, size, size)).astype(np.float32)
    y = rng.normal(size=(2, cond)).astype(np.float32)

    ours = np.asarray(biggan._gblock(params, "blk", jnp.asarray(x),
                                     jnp.asarray(y)))

    def ccbn_t(prefix, inp, yv):
        sub = {f"bn.{k.split('.', 2)[-1]}": v for k, v in params.items()
               if k.startswith(f"blk.{prefix}.")}
        return torch.from_numpy(np.asarray(biggan._ccbn(
            sub, "bn", jnp.asarray(inp.numpy()), jnp.asarray(yv))))

    def conv_t(name, inp, padding):
        w = _torch_sn_weight(np.asarray(params[f"blk.{name}.weight"]),
                             np.asarray(params[f"blk.{name}.u0"]))
        return F.conv2d(inp, torch.from_numpy(w),
                        torch.from_numpy(np.asarray(
                            params[f"blk.{name}.bias"])), padding=padding)

    xt = torch.from_numpy(x)
    h = F.relu(ccbn_t("bn1", xt, y))
    h = F.interpolate(h, scale_factor=2)
    xt2 = F.interpolate(xt, scale_factor=2)
    h = conv_t("conv1", h, 1)
    h = F.relu(ccbn_t("bn2", h, y))
    h = conv_t("conv2", h, 1)
    xt2 = conv_t("conv_sc", xt2, 0)
    expected = (h + xt2).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_full_generator_shapes():
    import jax
    params = biggan.init(jax.random.PRNGKey(0), n_classes=10)
    z = np.random.default_rng(0).standard_normal(
        (1, biggan.DIM_Z)).astype(np.float32)
    y = np.array([3])
    images, taps = biggan.apply(params, jnp.asarray(z), jnp.asarray(y))
    assert images.shape == (1, 3, 256, 256)
    assert np.all(np.isfinite(np.asarray(images)))
    assert np.asarray(images).min() >= -1 and np.asarray(images).max() <= 1
    assert set(biggan.LAYERS) <= set(taps)
    assert taps["layer0"].shape == (1, biggan.OUT_CH[0], 8, 8)
    assert taps["layer5"].shape == (1, biggan.OUT_CH[5], 256, 256)
    assert "attn4" in taps
