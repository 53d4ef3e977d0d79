"""Functional LSTM primitives with torch weight-layout parity.

The reference decoder uses ``nn.LSTMCell`` (reference:
src/milan/decoders.py:318-319) and the LM uses a 2-layer batch-first
``nn.LSTM`` (reference: src/milan/lms.py:50-54). To load the distributed
``milan-*.pth`` checkpoints with bit-level parity, these implementations use
the exact torch parameter layout and gate ordering:

- weights ``w_ih: (4*hidden, input)``, ``w_hh: (4*hidden, hidden)``,
  biases ``b_ih``/``b_hh: (4*hidden,)``;
- gate chunks ordered (input, forget, cell, output) — torch's ``ifgo``.

Everything is a pure function over parameter pytrees: jit/vmap/scan-safe and
trivially shardable (the matmuls are the MXU work; per-step state is tiny).
"""
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array, PRNGKey

__all__ = [
    "lstm_cell_init",
    "lstm_cell",
    "lstm_init",
    "lstm",
]

Params = Dict[str, Array]


def _uniform(key: PRNGKey, shape, bound: float) -> Array:
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def lstm_cell_init(key: PRNGKey, input_size: int, hidden_size: int) -> Params:
    """Initialize LSTMCell params with torch's U(-1/sqrt(h), 1/sqrt(h))."""
    bound = 1.0 / (hidden_size ** 0.5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(k1, (4 * hidden_size, input_size), bound),
        "w_hh": _uniform(k2, (4 * hidden_size, hidden_size), bound),
        "b_ih": _uniform(k3, (4 * hidden_size,), bound),
        "b_hh": _uniform(k4, (4 * hidden_size,), bound),
    }


def lstm_cell(params: Params, x: Array, h: Array,
              c: Array) -> Tuple[Array, Array]:
    """One LSTM cell step.

    Args:
        params: torch-layout cell parameters (see module docstring).
        x: (batch, input_size) inputs.
        h: (batch, hidden) previous hidden state.
        c: (batch, hidden) previous cell state.

    Returns:
        (h', c'), both (batch, hidden).
    """
    gates = (x @ params["w_ih"].T + params["b_ih"] +
             h @ params["w_hh"].T + params["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_init(key: PRNGKey, input_size: int, hidden_size: int,
              layers: int) -> Tuple[Params, ...]:
    """Initialize a multi-layer LSTM (one cell param dict per layer)."""
    keys = jax.random.split(key, layers)
    return tuple(
        lstm_cell_init(keys[layer],
                       input_size if layer == 0 else hidden_size,
                       hidden_size) for layer in range(layers))


def lstm_step(params_per_layer: Tuple[Params, ...], x: Array, h: Array,
              c: Array) -> Tuple[Array, Array, Array]:
    """Step a stacked LSTM once.

    Args:
        params_per_layer: One param dict per layer.
        x: (batch, input_size) input for this timestep.
        h, c: (layers, batch, hidden) states (torch ``nn.LSTM`` layout).

    Returns:
        (top_h, h', c') where top_h is the last layer's output.

    Note: inter-layer dropout (reference: lms.py:53) is inference-disabled in
    torch eval mode; training code applies it explicitly via ``lstm``.
    """
    hs, cs = [], []
    inp = x
    for layer, params in enumerate(params_per_layer):
        h_new, c_new = lstm_cell(params, inp, h[layer], c[layer])
        hs.append(h_new)
        cs.append(c_new)
        inp = h_new
    return inp, jnp.stack(hs), jnp.stack(cs)


def lstm(params_per_layer: Tuple[Params, ...],
         inputs: Array,
         h0: Optional[Array] = None,
         c0: Optional[Array] = None,
         dropout: float = 0.0,
         dropout_key: Optional[PRNGKey] = None) -> Tuple[Array, Array, Array]:
    """Run a stacked LSTM over a full sequence with ``lax.scan``.

    Args:
        params_per_layer: One param dict per layer.
        inputs: (batch, length, input_size), batch-first like the reference.
        h0, c0: Optional (layers, batch, hidden) initial states (zeros if
            omitted, matching torch).
        dropout: Inter-layer dropout rate, applied to each non-final layer's
            output at every timestep when ``dropout_key`` is given (torch
            ``nn.LSTM(dropout=...)`` semantics in train mode).
        dropout_key: PRNG key enabling dropout.

    Returns:
        (outputs (batch, length, hidden), h_final, c_final).
    """
    layers = len(params_per_layer)
    batch, length, _ = inputs.shape
    hidden = params_per_layer[0]["w_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros((layers, batch, hidden), inputs.dtype)
    if c0 is None:
        c0 = jnp.zeros((layers, batch, hidden), inputs.dtype)

    keep = 1.0 - dropout
    if dropout_key is not None and dropout > 0.0:
        # torch samples one dropout mask per (layer, timestep, element).
        drop_masks = (jax.random.bernoulli(
            dropout_key, keep,
            (length, layers - 1, batch, hidden)).astype(inputs.dtype) / keep)
    else:
        drop_masks = None

    def scan_fn(carry, xs):
        h, c = carry
        if drop_masks is None:
            x_t = xs
            mask_t = None
        else:
            x_t, mask_t = xs
        hs, cs = [], []
        inp = x_t
        for layer, params in enumerate(params_per_layer):
            h_new, c_new = lstm_cell(params, inp, h[layer], c[layer])
            hs.append(h_new)
            cs.append(c_new)
            inp = h_new
            if mask_t is not None and layer < layers - 1:
                inp = inp * mask_t[layer]
        return (jnp.stack(hs), jnp.stack(cs)), inp

    xs = jnp.swapaxes(inputs, 0, 1)  # (length, batch, input)
    xs = xs if drop_masks is None else (xs, drop_masks)
    (h_f, c_f), outputs = jax.lax.scan(scan_fn, (h0, c0), xs)
    return jnp.swapaxes(outputs, 0, 1), h_f, c_f
