"""Hardware validation of the int8 decode modes on a TRAINED model.

``int8_matmul`` quantizes activations dynamically per matmul, so its
correctness statement is behavioral, not bit-exact: on a model with
confident argmax margins the quantized chain must reproduce the
full-precision decode.  This script trains the full-size WaveNet (40
blocks, RF 4094) on a pure tone, then decodes the same prime through

- the resident full-precision fused kernel (reference),
- the HBM kernel at f32,
- the HBM kernel with int8 weight-only streaming, and
- the HBM kernel with int8 weights + native s8 x s8 MXU matmuls,

and reports per-mode token agreement vs the reference plus the dominant
frequency of the int8-matmul audio (the end-to-end "still sounds right"
check).  Run on a real TPU: ``python -m benchmarks.int8_decode_validation``.
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--decode", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.kernels.wavenet_decode import generate_tokens_fused
    from music_tpu.kernels.wavenet_decode_hbm import generate_tokens_fused_hbm
    from music_tpu.models import wavenet as wn
    from music_tpu.ops.mulaw import mu_law_decode

    t0 = time.time()
    cfg = wn.WaveNetConfig()
    sr, tone = 16000, 220.0
    t = np.arange(sr * 4) / sr
    codes = mu_law_encode_np(0.5 * np.sin(2 * np.pi * tone * t), 256)

    W = cfg.receptive_field + 8192
    rng = np.random.default_rng(0)
    params = wn.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(2e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, toks):
        l, g = jax.value_and_grad(wn.loss_fn)(p, toks, cfg)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    loss = None
    for _ in range(args.steps):
        s = rng.integers(0, len(codes) - W, size=4)
        batch = jnp.asarray(np.stack([codes[i : i + W] for i in s]), jnp.int32)
        params, opt, loss = step(params, opt, batch)

    P = cfg.receptive_field + max(cfg.dilations)
    prime = jnp.asarray(codes[:P], jnp.int32)[None]
    N = args.decode

    ref = np.asarray(generate_tokens_fused(
        params, prime, cfg=cfg, n_steps=N))
    hbm_f32 = np.asarray(generate_tokens_fused_hbm(
        params, prime, cfg=cfg, n_steps=N))
    w8 = np.asarray(generate_tokens_fused_hbm(
        params, prime, cfg=cfg, n_steps=N, weight_dtype=jnp.int8))
    q8 = np.asarray(generate_tokens_fused_hbm(
        params, prime, cfg=cfg, n_steps=N, weight_dtype=jnp.int8,
        int8_matmul=True))

    audio = np.asarray(mu_law_decode(jnp.asarray(q8[0]), 256), np.float64)
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    spec[0] = 0.0
    dom = float(np.fft.rfftfreq(len(audio), 1.0 / sr)[int(np.argmax(spec))])

    print(json.dumps({
        "metric": "int8_decode_validation",
        "train_loss": round(float(loss), 4),
        "agreement_hbm_f32": round(float((ref == hbm_f32).mean()), 4),
        "agreement_int8_weight_only": round(float((ref == w8).mean()), 4),
        "agreement_int8_matmul": round(float((ref == q8).mean()), 4),
        "int8_matmul_dominant_hz": round(dom, 1),
        "source_hz": tone,
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
