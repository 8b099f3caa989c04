"""µ-law companding codec + one-hot encoding, as jitted JAX ops.

Bit-exact parity targets (BASELINE.json: "bit-exact µ-law decode"):
- encode follows wavenet/audio_func.py:5-22 — float32 arithmetic, identical
  op order, final truncation toward zero (torch ``.long()``).
- decode follows wavenet/audio_func.py:24-39.
Verified against the reference formulas over all 256 code points and a dense
amplitude sweep in tests/test_mulaw.py.

One-hot: the reference's ``one_hot_encode`` builds ``[L, 256]`` then
``reshape(256, L)`` instead of transposing, scrambling the encoding
(faster_audio_data.py:62-83).  We implement the *intended* behavior
(docs/DIVERGENCES.md #1).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# Bit-exact decode table for the default 256-level codec, precomputed with
# the reference's torch float32 arithmetic (wavenet/audio_func.py:24-39) and
# committed as an artifact: torch's powf differs from XLA/numpy in the last
# ULP on a handful of codes, and a gather is faster than transcendentals on
# TPU anyway.  Regeneration + verification: tests/test_mulaw.py.
_DECODE_TABLE_Q256 = np.load(Path(__file__).parent / "_mulaw_decode_q256.npy")


def mu_law_encode(audio: jax.Array, quantization_channels: int = 256) -> jax.Array:
    """Encode float audio in [-1, 1] to int32 µ-law codes in [0, Q-1].

    Matches wavenet/audio_func.py:5-22 bit-for-bit in float32.
    """
    mu = jnp.float32(quantization_channels - 1)
    audio = audio.astype(jnp.float32)
    safe_abs = jnp.abs(jnp.clip(audio, -1.0, 1.0))
    magnitude = jnp.log1p(mu * safe_abs) / jnp.log1p(mu)
    signal = jnp.sign(audio) * magnitude
    encoded = (signal + 1.0) / 2.0 * mu + 0.5
    # torch .long() truncates toward zero; encoded >= 0 so trunc == floor
    return encoded.astype(jnp.int32)


def mu_law_decode(codes: jax.Array, quantization_channels: int = 256) -> jax.Array:
    """Decode int µ-law codes back to float32 audio in [-1, 1].

    Bit-exact vs wavenet/audio_func.py:24-39 for the default Q=256 (table
    gather); analytic float32 formula for other Q.
    """
    if quantization_channels == 256:
        return jnp.take(jnp.asarray(_DECODE_TABLE_Q256), codes, axis=0)
    mu = jnp.float32(quantization_channels - 1)
    signal = 2.0 * (codes.astype(jnp.float32) / mu) - 1.0
    magnitude = (1.0 / mu) * ((1.0 + mu) ** jnp.abs(signal) - 1.0)
    return jnp.sign(signal) * magnitude


def one_hot(codes: jax.Array, quantization_channels: int = 256, dtype=jnp.float32) -> jax.Array:
    """One-hot encode integer codes along a trailing channel axis
    (channels-last: [..., T] -> [..., T, Q]; TPU-friendly layout).

    Intended behavior of faster_audio_data.py:62-83 (whose reshape-vs-
    transpose bug we do not replicate — docs/DIVERGENCES.md #1)."""
    return jax.nn.one_hot(codes, quantization_channels, dtype=dtype)
