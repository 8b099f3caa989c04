"""WaveNet-autoencoder end-to-end quality run (full model scale).

The autoencoder's correctness claim is that the 512x-pooled bottleneck
*conditions* the decoder: one trained model must reconstruct different
source content differently.  This run trains the full-size AE (40 blocks,
bottleneck 512, pool 512 — wavenet_autoencoder/params/model_params.json
shape) on two pure tones, then reconstructs held-out clips of each tone
through encode -> cached conditioned decode (the fused Pallas kernel) and
checks each reconstruction's dominant frequency matches its *own* source
— the same decoder, steered only by the encoding.

Reference analog: wavenet_autoencoder/train.py + generate.py, which could
never run this (missing files, per-forward fresh conditioning convs —
SURVEY.md §2.5, docs/DIVERGENCES.md #10).

Run: ``python -m benchmarks.wavenet_ae_quality_run [--steps N]``
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np


def dominant_freq(audio: np.ndarray, sr: int = 16000) -> float:
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    spec[0] = 0.0
    return float(np.fft.rfftfreq(len(audio), 1.0 / sr)[int(np.argmax(spec))])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--window", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--decode-samples", type=int, default=8192)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.generate.wavenet_ae_generate import generate
    from music_tpu.models import wavenet_ae as ae
    from music_tpu.train import wavenet_ae_train as aet
    from music_tpu.train.wavenet_train import TrainState

    t0 = time.time()
    out_dir = Path(args.out) if args.out else Path(tempfile.mkdtemp(prefix="ae_run_"))
    cfg = ae.WaveNetAEConfig()  # full-size: 40 blocks, bottleneck 512, pool 512
    sr = 16000
    tones = (220.0, 330.0)
    t = np.arange(sr * 6) / sr
    clips = [0.5 * np.sin(2 * np.pi * f * t) for f in tones]
    codes = [mu_law_encode_np(c, cfg.quantization_channel) for c in clips]

    W = cfg.receptive_field + args.window
    rng = np.random.default_rng(0)

    def batch():
        rows = []
        for _ in range(args.batch):
            c = codes[rng.integers(len(codes))]
            s = rng.integers(0, len(c) - W)
            rows.append(c[s : s + W])
        return jnp.asarray(np.stack(rows), jnp.int32)

    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(args.lr)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = aet.make_train_step(cfg, tx)

    first = last = None
    for i in range(args.steps):
        state, loss = step_fn(state, batch())
        if i == 0:
            first = float(loss)
        last = float(loss)

    results = []
    for f, clip in zip(tones, clips):
        # held-out tail segment (training windows were drawn uniformly, but
        # the content — a steady tone — is what the bottleneck must carry)
        src = clip[-(cfg.receptive_field + args.decode_samples):]
        audio = generate(
            cfg=cfg, params=state.params, source_audio=src,
            out_path=out_dir / f"recon_{int(f)}hz.wav", sr=sr,
        )
        seg = np.asarray(audio[-args.decode_samples:], np.float64)
        results.append({
            "source_hz": f,
            "reconstructed_hz": round(dominant_freq(seg, sr), 1),
            "rms": round(float(np.sqrt(np.mean(seg**2))), 4),
        })

    ok = all(abs(r["reconstructed_hz"] - r["source_hz"]) < 8.0 for r in results)
    print(json.dumps({
        "metric": "wavenet_ae_e2e_quality",
        "steps": args.steps,
        "loss_first": round(first, 4),
        "loss_last": round(last, 4),
        "reconstructions": results,
        "bottleneck_conditions_decoder": ok,
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
