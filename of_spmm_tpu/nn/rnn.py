"""Recurrent layers (reference: nn/modules/rnn.py — RNN/LSTM/GRU).

Torch gate conventions and weight shapes (w_ih (G*H, I), w_hh (G*H, H),
gate order i,f,g,o for LSTM and r,z,n for GRU) so torch state dicts load
directly. The time loop is a lax.scan — one compiled step reused across
the sequence (the XLA-native shape of recurrence).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _rnn_params(key, input_size, hidden_size, gates):
    b = float(1.0 / np.sqrt(hidden_size))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(k1, (gates * hidden_size, input_size), b),
        "w_hh": _uniform(k2, (gates * hidden_size, hidden_size), b),
        "b_ih": _uniform(k3, (gates * hidden_size,), b),
        "b_hh": _uniform(k4, (gates * hidden_size,), b),
    }


@dataclasses.dataclass(frozen=True)
class LSTM:
    """Single-layer unidirectional LSTM over (T, B, I) sequences."""

    input_size: int
    hidden_size: int

    def init(self, key) -> dict:
        return _rnn_params(key, self.input_size, self.hidden_size, 4)

    def apply(self, params, x, *, state=None, train=False, rng=None):
        T, B, _ = x.shape
        H = self.hidden_size
        h0 = jnp.zeros((B, H)) if state is None else state[0]
        c0 = jnp.zeros((B, H)) if state is None else state[1]
        w_ih, w_hh = params["w_ih"], params["w_hh"]
        bias = params["b_ih"] + params["b_hh"]

        def step(carry, xt):
            h, c = carry
            z = xt @ w_ih.T + h @ w_hh.T + bias
            i, f, g, o = jnp.split(z, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (h, c), ys = jax.lax.scan(step, (h0, c0), x)
        return ys, (h, c)


@dataclasses.dataclass(frozen=True)
class GRU:
    """Single-layer unidirectional GRU over (T, B, I) sequences."""

    input_size: int
    hidden_size: int

    def init(self, key) -> dict:
        return _rnn_params(key, self.input_size, self.hidden_size, 3)

    def apply(self, params, x, *, state=None, train=False, rng=None):
        T, B, _ = x.shape
        H = self.hidden_size
        h0 = jnp.zeros((B, H)) if state is None else state
        w_ih, w_hh = params["w_ih"], params["w_hh"]
        b_ih, b_hh = params["b_ih"], params["b_hh"]

        def step(h, xt):
            gi = xt @ w_ih.T + b_ih
            gh = h @ w_hh.T + b_hh
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h = (1 - z) * n + z * h
            return h, h

        h, ys = jax.lax.scan(step, h0, x)
        return ys, h


@dataclasses.dataclass(frozen=True)
class RNN:
    """Vanilla tanh/relu RNN over (T, B, I)."""

    input_size: int
    hidden_size: int
    nonlinearity: str = "tanh"

    def init(self, key) -> dict:
        return _rnn_params(key, self.input_size, self.hidden_size, 1)

    def apply(self, params, x, *, state=None, train=False, rng=None):
        T, B, _ = x.shape
        h0 = jnp.zeros((B, self.hidden_size)) if state is None else state
        act = jnp.tanh if self.nonlinearity == "tanh" else jax.nn.relu
        bias = params["b_ih"] + params["b_hh"]
        w_ih, w_hh = params["w_ih"], params["w_hh"]

        def step(h, xt):
            h = act(xt @ w_ih.T + h @ w_hh.T + bias)
            return h, h

        h, ys = jax.lax.scan(step, h0, x)
        return ys, h
