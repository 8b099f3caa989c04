"""WaveNet-autoencoder generation: encode a source clip, decode a
reconstruction autoregressively, write a wav.

Parity surface: wavenet_autoencoder/generate.py (whose naive loop does a
full receptive-field forward per sample and has import/typing bugs —
SURVEY.md §2.5); here the decoder reuses the cached ring-buffer decode
with per-frame conditioning biases (models/wavenet_ae.generate_tokens).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.data import wavio
from music_tpu.data.audio import mu_law_encode_np
from music_tpu.models import wavenet_ae as ae
from music_tpu.ops.mulaw import mu_law_decode


def generate(
    *,
    cfg: ae.WaveNetAEConfig,
    params=None,
    checkpoint_dir: str | Path | None = None,
    source_audio: np.ndarray | None = None,
    source_path: str | Path | None = None,
    out_path: str | Path,
    sr: int = 16000,
    duration: float | None = None,
    sample_mode: str = "argmax",
    seed: int = 0,
    backend: str = "fused",
) -> np.ndarray:
    """Reconstruct ``source`` through the bottleneck; write the decoded
    audio to ``out_path``.  ``duration`` limits the output length.
    ``backend``: "fused" (conditioned Pallas kernel, argmax) or "scan"."""
    if params is None:
        if checkpoint_dir is None:
            raise ValueError("need params or checkpoint_dir")
        example = ae.init_params(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.restore_subtree(checkpoint_dir, example, prefix=".params")
    if source_audio is None:
        if source_path is None:
            raise ValueError("need source_audio or source_path")
        source_audio, src_sr = wavio.read_wav(source_path)
        source_audio = wavio.resample(source_audio, src_sr, sr)

    codes = mu_law_encode_np(np.asarray(source_audio), cfg.quantization_channel)
    tokens = jnp.asarray(codes, jnp.int32)[None, :]
    encoding = ae.encode(params, tokens, cfg)

    n_steps = len(codes) if duration is None else min(int(duration * sr), len(codes))
    fused_min = cfg.receptive_field + max(cfg.dilations)
    if backend == "fused" and sample_mode == "argmax" and tokens.shape[1] >= fused_min:
        from music_tpu.kernels.wavenet_ae_decode import generate_tokens_fused

        # chunk long decodes: the kernel's int32 token output is VMEM-
        # resident, so each call is bounded and re-primed from the previous
        # tail; `pos_offset` (a dynamic SMEM scalar — no recompile per
        # chunk) keeps the frame conditioning on the utterance clock
        from music_tpu.generate.wavenet_generate import _chunked_fused

        out_codes = _chunked_fused(
            lambda p, rows, **kw: generate_tokens_fused(p, encoding, rows, **kw),
            params, tokens[:, :fused_min], cfg=cfg, n_steps=n_steps,
            chunk_kw=lambda done: {"pos_offset": done},
            interpret=jax.default_backend() != "tpu",
        )
    else:
        prime_len = min(cfg.receptive_field, tokens.shape[1])
        prime = tokens[:, :prime_len]
        out_codes = ae.generate_tokens(
            params, encoding, prime, jax.random.PRNGKey(seed),
            cfg=cfg, n_steps=n_steps, sample_mode=sample_mode,
        )
    audio = np.asarray(mu_law_decode(out_codes[0], cfg.quantization_channel))
    wavio.write_wav(out_path, audio, sr)
    return audio
