"""Causal / dilated convolution primitives, designed for the MXU.

The reference computes everything with cuDNN ``nn.Conv1d`` (wavenet/model.py,
wavenet_autoencoder/model1.py).  On TPU, a width-``fw`` dilated conv over
channels-last activations is ``fw`` shifted matmuls:

    y[t] = sum_k  x[t - (fw-1-k)*d] @ w[k]        (valid, causal)

which XLA tiles straight onto the 128x128 systolic array with no im2col and
fuses with the surrounding elementwise ops.  For WaveNet (fw=2) each layer is
exactly two GEMMs — and the filter+gate pair of every residual block is fused
into a single GEMM with ``2*dilation_channels`` output columns (the trick
wavenet_autoencoder/model1.py:175-192 uses for its ``filter_gate`` conv),
halving weight-streaming traffic from HBM.

Layout convention: activations are ``[batch, time, channels]`` and weights
``[fw, in_ch, out_ch]`` throughout the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dilated_causal_conv(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    dilation: int = 1,
    *,
    precision=None,
    fuse_taps: bool = False,
) -> jax.Array:
    """Valid (no-padding) causal dilated conv.

    Args:
      x: ``[B, T, Cin]`` activations.
      w: ``[fw, Cin, Cout]`` taps; ``w[-1]`` multiplies the current timestep,
         ``w[0]`` the oldest (``t - (fw-1)*d``) — matching the semantics of
         ``nn.Conv1d(..., dilation=d)`` with no padding (wavenet/model.py:56-65).
      b: optional ``[Cout]`` bias.
      dilation: dilation rate ``d``.
      fuse_taps: gather the ``fw`` taps side-by-side and contract with the
        reshaped ``[fw*Cin, Cout]`` weight in ONE GEMM instead of ``fw``
        summed GEMMs.  Same math (reassociated adds); ``fw``x the MXU
        contraction depth, which matters when ``Cin`` (32/64) is far below
        the 128-lane array — measured +9-17% on the WaveNet train step
        (docs/BENCHMARKS.md "Training GEMM width A/B").  Decode paths keep
        the per-tap form (the Pallas kernels consume per-tap packs).

    Returns:
      ``[B, T - (fw-1)*d, Cout]``.
    """
    fw = w.shape[0]
    T = x.shape[1]
    out_t = T - (fw - 1) * dilation
    if out_t <= 0:
        raise ValueError(f"sequence length {T} too short for fw={fw}, d={dilation}")
    if fuse_taps:
        xcat = jnp.concatenate(
            [
                jax.lax.slice_in_dim(x, k * dilation, k * dilation + out_t, axis=1)
                for k in range(fw)
            ],
            axis=-1,
        )
        wcat = w.reshape(fw * w.shape[1], w.shape[2])
        y = jnp.einsum("btc,cd->btd", xcat, wcat, precision=precision)
        return y if b is None else y + b
    y = None
    for k in range(fw):
        start = k * dilation
        xs = jax.lax.slice_in_dim(x, start, start + out_t, axis=1)
        term = jnp.einsum("btc,cd->btd", xs, w[k], precision=precision)
        y = term if y is None else y + term
    if b is not None:
        y = y + b
    return y


def causal_conv(x, w, b=None, *, precision=None):
    """Width-``fw`` causal conv with dilation 1 (the reference's 'causal
    layer', wavenet/model.py:46-50)."""
    return dilated_causal_conv(x, w, b, dilation=1, precision=precision)


def conv1x1(x, w, b=None, *, precision=None):
    """Pointwise (1x1) conv — a plain matmul over the channel axis
    (the reference's dense/skip/post layers, wavenet/model.py:66-84)."""
    y = jnp.einsum("btc,cd->btd", x, w, precision=precision)
    if b is not None:
        y = y + b
    return y


def token_causal_conv(
    tokens: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    dilation: int = 1,
) -> jax.Array:
    """Causal dilated conv over *one-hot of integer tokens*, computed as
    embedding gathers: ``onehot(tok) @ w[k] == w[k][tok]``.

    This is how the framework feeds raw µ-law codes into WaveNet without ever
    materializing the reference's ``[B, 256, 44093]`` one-hot windows
    (faster_audio_data.py:45-48) — same math, 256x less input traffic.

    Args:
      tokens: ``[B, T]`` int codes.
      w: ``[fw, Q, Cout]``.

    Returns:
      ``[B, T - (fw-1)*d, Cout]``.
    """
    fw = w.shape[0]
    T = tokens.shape[1]
    out_t = T - (fw - 1) * dilation
    y = None
    for k in range(fw):
        start = k * dilation
        toks = jax.lax.slice_in_dim(tokens, start, start + out_t, axis=1)
        term = jnp.take(w[k], toks, axis=0)
        y = term if y is None else y + term
    if b is not None:
        y = y + b
    return y
