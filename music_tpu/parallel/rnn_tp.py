"""Model-axis (hidden-split) LSTM — tensor parallelism for recurrent cells.

Splits the HIDDEN dimension of an LSTM over the ``model`` mesh axis: shard
``s`` owns hidden units ``[s*H/m, (s+1)*H/m)`` — their four gate columns,
their cell-state slice, and their slice of ``h``.  Because the gate packing
is (i, f, g, o)-major in the weight columns, a plain contiguous split of
the ``4H`` axis would scatter one hidden unit's gates across shards; the
weights are therefore REPACKED gate-major-within-shard
(:func:`repack_lstm_params`) so ``P(None, "model")`` on the repacked
matrix gives every shard contiguous ``[In, 4*H/m]`` columns holding all
four gates of its units.

Per step each shard computes its local gates from its weight columns and
the FULL ``h`` (one ``[B, H]`` psum reassembles ``h`` from the shards'
slices — scatter-into-zeros + psum, which shard_map's value-mesh-axis
checks recognize as replicated); ``c`` never leaves its shard.

Used by the C-RNN-GAN discriminator's bi-LSTM stack (the one GAN family
whose widest layer is recurrent rather than convolutional).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def lstm_specs() -> dict:
    """PartitionSpecs for a (repacked) ops.rnn LSTM param dict."""
    return {
        "wi": P(None, "model"),
        "wh": P(None, "model"),
        "bi": P("model"),
        "bh": P("model"),
    }


def _gate_perm(H: int, m: int) -> np.ndarray:
    """Column permutation [4H]: shard-major, then gate-major, then unit."""
    Hl = H // m
    idx = []
    for s in range(m):
        for gate in range(4):
            start = gate * H + s * Hl
            idx.extend(range(start, start + Hl))
    return np.asarray(idx)


def repack_lstm_params(params: dict, m: int) -> dict:
    """Permute the 4H gate columns so ``P(None, "model")`` sharding gives
    each shard all four gates of its own hidden units."""
    H = params["wh"].shape[0]
    if H % m:
        raise ValueError(f"hidden {H} not divisible by model axis {m}")
    perm = _gate_perm(H, m)
    return {
        "wi": params["wi"][:, perm],
        "wh": params["wh"][:, perm],
        "bi": params["bi"][perm],
        "bh": params["bh"][perm],
    }


def lstm_cell_tp(
    params_local: dict,
    x: jax.Array,
    state: tuple[jax.Array, jax.Array],
    axis_name: str = "model",
):
    """One hidden-split LSTM step inside shard_map.

    ``x``: [B, In] replicated.  ``state``: (h_full [B, H] replicated,
    c_local [B, H/m] this shard's slice).  Returns the same structure;
    one [B, H] psum per step.
    """
    h_full, c_local = state
    gates = (
        x @ params_local["wi"] + h_full @ params_local["wh"]
        + params_local["bi"] + params_local["bh"]
    )  # [B, 4*Hl] — this shard's units, gate-major
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_local = jax.nn.sigmoid(f) * c_local + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_local = jax.nn.sigmoid(o) * jnp.tanh(c_local)

    Hl = h_local.shape[-1]
    m = jax.lax.axis_size(axis_name)
    s = jax.lax.axis_index(axis_name)
    buf = jnp.zeros((h_local.shape[0], m * Hl), h_local.dtype)
    buf = jax.lax.dynamic_update_slice_in_dim(buf, h_local, s * Hl, axis=1)
    h_full = jax.lax.psum(buf, axis_name)  # replicated [B, H]
    return h_full, c_local


def lstm_zero_state_tp(params_local: dict, batch: int, hidden: int, m: int,
                       like: jax.Array, dtype=jnp.float32):
    """(h_full [B,H], c_local [B,H/m]) zeros with shard_map-compatible
    value-mesh-axis types: ``h_full`` ties to ``like`` (the scanned input's
    varying status), ``c_local`` additionally to a model-sharded param leaf
    — the updated ``c`` is model-varying, so its initial value must be too."""
    jitter = (like.ravel()[0] * 0.0).astype(dtype)
    cjit = jitter + (params_local["bi"][0] * 0.0).astype(dtype)
    return (
        jnp.zeros((batch, hidden), dtype) + jitter,
        jnp.zeros((batch, hidden // m), dtype) + cjit,
    )
