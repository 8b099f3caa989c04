"""WaveNet audio generation entry point.

Parity surface: wavenet/fast_generate.py:144-186 —
``generate(model_path, ..., start_piece, sr, duration)`` loads a trained
model, seeds with a receptive field of µ-law silence (code 128,
fast_generate.py:158-161), autoregressively decodes ``duration * sr``
samples, µ-law-decodes (bit-exact — music_tpu/ops/mulaw.py) and writes a
16-bit PCM wav.

The decode itself is :func:`music_tpu.models.wavenet.generate_tokens` — one
compiled ``lax.scan`` instead of 160k Python steps (fast_generate.py:162-172).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.data import wavio
from music_tpu.models import wavenet as wn
from music_tpu.ops.mulaw import mu_law_decode


def _fused_decode(params, prime, cfg, n_steps, on_tpu, sample_mode, temperature, seed):
    """Pick the right Pallas kernel for this config: the fully-resident one
    when the weights fit VMEM and every dilation group fits one 128-lane
    row, else the HBM-streaming variant (kernels/wavenet_decode_hbm.py).
    Returns None when neither supports the config (caller falls back to the
    lax.scan path)."""
    from music_tpu.kernels import wavenet_decode, wavenet_decode_hbm

    weight_bytes = sum(
        int(np.prod(v.shape)) * 4 for v in jax.tree_util.tree_leaves(params)
    )
    try:
        wavenet_decode._grouping(cfg)
        resident_ok = weight_bytes < 12e6  # leave room for rings + output
    except NotImplementedError:
        resident_ok = False
    fn = (
        wavenet_decode.generate_tokens_fused
        if resident_ok
        else wavenet_decode_hbm.generate_tokens_fused_hbm
    )
    try:
        return fn(
            params, prime, cfg=cfg, n_steps=n_steps, interpret=not on_tpu,
            sample_mode=sample_mode, temperature=temperature, seed=seed,
        )
    except NotImplementedError:
        return None


def generate(
    *,
    cfg: wn.WaveNetConfig,
    params=None,
    checkpoint_dir: str | Path | None = None,
    out_path: str | Path,
    start_piece: np.ndarray | None = None,
    sr: int = 16000,
    duration: float = 10.0,
    sample_mode: str = "argmax",
    temperature: float = 1.0,
    seed: int = 0,
    backend: str = "fused",
) -> np.ndarray:
    """Generate ``duration`` seconds of audio and write it to ``out_path``.

    ``start_piece``: optional µ-law codes to prime with; defaults to a full
    receptive field (+ max dilation) of silence (code Q//2 = 128 for Q=256).
    ``backend``: ``"fused"`` (single Pallas kernel, argmax only — the fast
    path) or ``"scan"`` (lax.scan; supports categorical sampling).
    """
    if params is None:
        if checkpoint_dir is None:
            raise ValueError("need params or checkpoint_dir")
        example = wn.init_params(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.restore_subtree(checkpoint_dir, example, prefix=".params")

    prime_len = cfg.receptive_field + max(cfg.dilations)
    if start_piece is None:
        start_piece = np.full(
            (prime_len,), cfg.quantization_channels // 2, np.int32
        )
    prime = jnp.asarray(start_piece, jnp.int32)[None, :]

    n_steps = int(duration * sr)
    on_tpu = jax.default_backend() == "tpu"
    # fused categorical needs the on-chip PRNG (TPU only)
    fused_ok = sample_mode == "argmax" or (sample_mode == "categorical" and on_tpu)
    if backend == "fused" and fused_ok and prime.shape[1] >= prime_len:
        codes = _fused_decode(
            params, prime, cfg, n_steps, on_tpu, sample_mode, temperature, seed
        )
        if codes is None:  # no fused kernel fits this config -> scan path
            backend = "scan"
    if backend != "fused" or not fused_ok or prime.shape[1] < prime_len:
        codes = wn.generate_tokens(
            params,
            prime,
            jax.random.PRNGKey(seed),
            cfg=cfg,
            n_steps=n_steps,
            prime_len=prime.shape[1],
            sample_mode=sample_mode,
            temperature=temperature,
        )
    audio = np.asarray(mu_law_decode(codes[0], cfg.quantization_channels))
    wavio.write_wav(out_path, audio, sr)
    return audio
