"""Polyphonic WaveNet end-to-end quality run (VERDICT r2 action #6).

Round 2's end-to-end check trained on a single 220 Hz sine — a weak
generalization claim.  This run trains the FULL 40-block WaveNet on a
*chord* corpus (three simultaneous tones with per-clip phase and amplitude
variation) and verifies the generated audio's spectrum reproduces all
three chord partials — µ-law encode -> sharded train step (tap-fused
GEMMs, bf16 compute) -> fused Pallas decode primed on real context ->
bit-exact µ-law decode -> FFT.

Run: python -m benchmarks.wavenet_poly_quality_run [--steps N]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

CHORD_HZ = (220.0, 277.18, 329.63)  # A3 major triad: A, C#, E
SR = 16000


def make_chord_corpus(n_clips=6, secs=20.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * secs)) / SR
    clips = []
    for _ in range(n_clips):
        x = np.zeros_like(t)
        for f in CHORD_HZ:
            amp = rng.uniform(0.12, 0.22)
            phase = rng.uniform(0, 2 * np.pi)
            x += amp * np.sin(2 * np.pi * f * t + phase)
        clips.append(x.astype(np.float32))
    return clips


def spectrum_peaks(audio, n_peaks=3, fmin=50.0):
    """Frequencies of the n_peaks largest well-separated spectral peaks."""
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    freqs = np.fft.rfftfreq(len(audio), 1 / SR)
    spec[freqs < fmin] = 0.0
    peaks = []
    for _ in range(n_peaks):
        i = int(np.argmax(spec))
        peaks.append(float(freqs[i]))
        lo = np.searchsorted(freqs, freqs[i] - 15.0)
        hi = np.searchsorted(freqs, freqs[i] + 15.0)
        spec[lo:hi] = 0.0
    return sorted(peaks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="/tmp/wavenet_poly")
    args = ap.parse_args()
    t0 = time.time()

    from pathlib import Path

    from music_tpu.data.audio import AudioWindows, mu_law_encode_np
    from music_tpu.data import wavio
    from music_tpu.kernels.wavenet_decode import generate_tokens_fused
    from music_tpu.models import wavenet as wn
    from music_tpu.ops.mulaw import mu_law_decode
    from music_tpu.parallel.mesh import MeshSpec, make_mesh
    from music_tpu.train import wavenet_train as wt

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    clips = make_chord_corpus()
    corpus_peaks = spectrum_peaks(clips[0])
    codes = [mu_law_encode_np(c, 256) for c in clips]

    cfg = wn.WaveNetConfig()
    WL, B = 12_288, 8
    mesh = make_mesh(MeshSpec(data=1, seq=1, model=1))
    tx = optax.adam(1e-3)
    state = wt.init_state(jax.random.PRNGKey(0), cfg, tx, mesh)
    step_fn, _ = wt.make_train_step(cfg, tx, mesh, WL, compute_dtype=jnp.bfloat16)

    windows = AudioWindows(codes, receptive_field=cfg.receptive_field,
                           window_length=WL)
    windows.check_vocab(cfg.quantization_channels)
    rng = np.random.default_rng(1)
    losses = []
    for i in range(args.steps):
        idx = rng.integers(0, len(windows), B)
        batch = jnp.asarray(windows.gather(idx))
        state, loss = step_fn(state, batch)
        if i % 50 == 0 or i == args.steps - 1:
            losses.append(round(float(loss), 4))
            print(f"# step {i}: loss {float(loss):.4f}", file=sys.stderr)

    # decode 1 s primed with real chord context
    P = cfg.receptive_field + max(cfg.dilations)
    prime = jnp.asarray(codes[0][:P], jnp.int32)[None, :]
    n_steps = SR
    toks = generate_tokens_fused(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), state.params),
        prime, cfg=cfg, n_steps=n_steps,
        interpret=jax.default_backend() != "tpu",
    )
    audio = np.asarray(mu_law_decode(toks[0], 256))
    wavio.write_wav(out_dir / "chord_gen.wav", audio, SR)

    gen_peaks = spectrum_peaks(audio[2000:])  # skip transient
    errs = [min(abs(g - f) for g in gen_peaks) for f in CHORD_HZ]
    df = SR / len(audio[2000:])
    out = {
        "metric": "wavenet_polyphonic_quality",
        "chord_hz": list(CHORD_HZ),
        "corpus_peaks_hz": [round(p, 1) for p in corpus_peaks],
        "generated_peaks_hz": [round(p, 1) for p in gen_peaks],
        "max_peak_error_hz": round(max(errs), 2),
        "fft_bin_hz": round(df, 2),
        "chord_reproduced": bool(max(errs) < 3 * df + 2.0),
        "first_loss": losses[0],
        "final_loss": losses[-1],
        "train_steps": args.steps,
        "gen_rms": round(float(np.sqrt(np.mean(audio**2))), 3),
        "corpus_rms": round(float(np.sqrt(np.mean(clips[0] ** 2))), 3),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
