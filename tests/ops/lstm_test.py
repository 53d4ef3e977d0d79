"""Tests for functional LSTM vs torch (the weight-parity oracle)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neuron_descriptions_tpu.ops import lstm


def torch_cell_params(cell: "torch.nn.LSTMCell"):
    return {
        "w_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }


def test_lstm_cell_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.LSTMCell(12, 8)
    params = torch_cell_params(cell)

    x = torch.randn(5, 12)
    h = torch.randn(5, 8)
    c = torch.randn(5, 8)
    with torch.no_grad():
        h_t, c_t = cell(x, (h, c))

    h_j, c_j = lstm.lstm_cell(params, jnp.asarray(x.numpy()),
                              jnp.asarray(h.numpy()), jnp.asarray(c.numpy()))
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), atol=1e-5)


def test_stacked_lstm_matches_torch():
    torch.manual_seed(1)
    layers, hidden, emb = 2, 16, 10
    net = torch.nn.LSTM(emb, hidden, num_layers=layers, batch_first=True)
    params = tuple({
        "w_ih": jnp.asarray(getattr(net, f"weight_ih_l{i}").detach().numpy()),
        "w_hh": jnp.asarray(getattr(net, f"weight_hh_l{i}").detach().numpy()),
        "b_ih": jnp.asarray(getattr(net, f"bias_ih_l{i}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(net, f"bias_hh_l{i}").detach().numpy()),
    } for i in range(layers))

    x = torch.randn(4, 7, emb)
    with torch.no_grad():
        out_t, (h_t, c_t) = net(x)

    out_j, h_j, c_j = lstm.lstm(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), atol=1e-5)


def test_lstm_step_matches_unrolled():
    import jax

    params = lstm.lstm_init(jax.random.PRNGKey(0), 6, 8, 2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 5, 6)).astype(np.float32))

    out, h, c = lstm.lstm(params, x)

    h_s = jnp.zeros((2, 3, 8))
    c_s = jnp.zeros((2, 3, 8))
    tops = []
    for t in range(5):
        top, h_s, c_s = lstm.lstm_step(params, x[:, t], h_s, c_s)
        tops.append(top)
    np.testing.assert_allclose(np.asarray(out),
                               np.stack([np.asarray(t) for t in tops], 1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_s), atol=1e-6)
