"""Recurrent cells as scan-ready pure functions.

The reference uses cuDNN ``nn.LSTM`` / ``nn.LSTMCell`` everywhere
(SeqGan_Pytorch/generator.py:24, leak_gan/model.py:148,183,
c-rnn-gan/model.py:50-58,116-120).  TPU-native form: a fused-gate cell —
one ``[B, In+H] @ [In+H, 4H]`` GEMM per step — driven by ``lax.scan`` for
teacher-forced passes and by generation scans for sampling.  Gate packing
follows torch's (i, f, g, o) convention so ports of reference configs keep
their meaning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.parallel.vma import varying_zero


def lstm_init(key, in_dim: int, hidden: int, dtype=jnp.float32,
              init: str = "torch") -> dict:
    """``init="torch"``: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases
    (the nn.LSTMCell default).  ``init="normal"``: every parameter
    N(0, 1) — the target-LSTM oracle init (leak_gan/target.py:30-32
    re-inits all params with nn.init.normal(std=1.0)), which makes the
    oracle distribution peaked enough for oracle NLL to register quality."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if init == "normal":
        f = lambda k, shape: jax.random.normal(k, shape, dtype)
    elif init == "torch":
        bound = 1.0 / np.sqrt(hidden)
        f = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    else:
        raise ValueError(f"unknown init {init!r}")
    return {
        "wi": f(k1, (in_dim, 4 * hidden)),
        "wh": f(k2, (hidden, 4 * hidden)),
        "bi": f(k3, (4 * hidden,)),
        "bh": f(k4, (4 * hidden,)),
    }


def lstm_cell(params: dict, x: jax.Array, state: tuple[jax.Array, jax.Array]):
    """One LSTM step.  x: [B, In]; state: (h, c) each [B, H] -> (h', c')."""
    h, c = state
    gates = x @ params["wi"] + h @ params["wh"] + params["bi"] + params["bh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def lstm_zero_state(batch: int, hidden: int, dtype=jnp.float32):
    return jnp.zeros((batch, hidden), dtype), jnp.zeros((batch, hidden), dtype)


def lstm_scan(params: dict, xs: jax.Array, state=None):
    """Teacher-forced LSTM over a sequence.  xs: [B, T, In].

    Returns (hs [B, T, H], (h_T, c_T)).
    """
    B = xs.shape[0]
    H = params["wh"].shape[0]
    if state is None:
        # derive the zero state from xs so its device-varying status matches
        # the scan inputs under shard_map (parallel/vma.py); numerically
        # identical to zeros
        zero = varying_zero(xs, xs.dtype)
        state = (zero + jnp.zeros((B, H), xs.dtype), zero + jnp.zeros((B, H), xs.dtype))

    def step(carry, x_t):
        h, c = lstm_cell(params, x_t, carry)
        return (h, c), h

    state, hs = jax.lax.scan(step, state, jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(hs, 0, 1), state


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32,
                init: str = "torch") -> dict:
    """``init="torch"``: nn.Linear default U(±1/sqrt(in));
    ``init="normal"``: N(0, 1) everywhere (leak_gan/target.py:30-32)."""
    k1, k2 = jax.random.split(key)
    if init == "normal":
        return {
            "w": jax.random.normal(k1, (in_dim, out_dim), dtype),
            "b": jax.random.normal(k2, (out_dim,), dtype),
        }
    if init != "torch":
        raise ValueError(f"unknown init {init!r}")
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "w": jax.random.uniform(k1, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (out_dim,), dtype, -bound, bound),
    }


def linear(params: dict, x: jax.Array) -> jax.Array:
    return x @ params["w"] + params["b"]


def embedding_init(key, vocab: int, dim: int, dtype=jnp.float32, std: float = 1.0) -> jax.Array:
    """torch nn.Embedding default: N(0, 1)."""
    return std * jax.random.normal(key, (vocab, dim), dtype)
