"""C-RNN-GAN end-to-end quality run — the full-pipeline check for the one
reference family that never ran (c-rnn-gan/train.py is a stub,
generate.py an empty file; SURVEY.md §2.4).

Pipeline exercised end to end, at the reference's intended scale (hidden
350, noise 100, song_length 100, 100 GAN epochs —
params/c_rnn_gan/*.json):

1. synthesize a multi-genre/composer MIDI corpus from musical patterns
   (scales/arpeggios with per-composer register, tempo, and velocity) via
   ``data/midi.events_to_midi`` — no network needed;
2. parse it back through the real loader (``load_midi_dataset``) and build
   the genre+composer one-hot meta tensor (``build_meta_onehots``);
3. MSE-pretrain + adversarial-train the meta-conditioned GAN;
4. generate conditioned songs, write real .mid files, re-parse them
   (round-trip validity) and score per-feature moment distance vs the
   corpus before/after training.

Run: ``python -m benchmarks.crnngan_quality_run [--songs N] [--epochs N]``
Prints one JSON line with losses, D accuracy, and the moment distances.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np

# MIDI note numbers per (genre, composer): distinct registers + figures so
# conditioning has something to learn
PATTERNS = {
    ("classical", "bach"): dict(notes=[60, 62, 64, 65, 67, 69, 71, 72], step=96, dur=90, vel=70),
    ("classical", "mozart"): dict(notes=[72, 76, 79, 84, 79, 76], step=48, dur=45, vel=85),
    ("jazz", "evans"): dict(notes=[48, 51, 55, 58, 60, 58, 55, 51], step=64, dur=120, vel=60),
    ("jazz", "monk"): dict(notes=[36, 42, 46, 49, 46, 42], step=128, dur=60, vel=100),
}


def tone_freq(note: int) -> float:
    return 440.0 * 2.0 ** ((note - 69) / 12.0)


def synthesize_corpus(root: Path, songs_per_composer: int, rng: np.random.Generator):
    """Write root/genre/composer/song_i.mid pattern corpora."""
    from music_tpu.data.midi import events_to_midi

    for (genre, composer), pat in PATTERNS.items():
        for s in range(songs_per_composer):
            events = []
            phase = rng.integers(0, len(pat["notes"]))
            for i in range(160):
                note = pat["notes"][(i + phase) % len(pat["notes"])]
                note += int(rng.integers(-1, 2))  # slight variation
                events.append([
                    pat["step"] * (1 + (i % 4 == 3)),      # delta ticks
                    pat["dur"] + float(rng.integers(-5, 6)),
                    tone_freq(note),
                    pat["vel"] + float(rng.integers(-5, 6)),
                ])
            out = root / genre / composer / f"song_{s}.mid"
            events_to_midi(np.asarray(events, np.float64), out)


def moment_distance(gen: np.ndarray, real: np.ndarray) -> float:
    """Mean over features of |mean diff|/std_real + |std ratio - 1|."""
    g = gen.reshape(-1, gen.shape[-1]).astype(np.float64)
    r = real.reshape(-1, real.shape[-1]).astype(np.float64)
    rs = r.std(axis=0) + 1e-9
    return float(np.mean(
        np.abs(g.mean(axis=0) - r.mean(axis=0)) / rs
        + np.abs(g.std(axis=0) / rs - 1.0)
    ))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--songs", type=int, default=16, help="songs per composer")
    ap.add_argument("--epochs", type=int, default=100, help="GAN epochs (reference: 100)")
    ap.add_argument("--pretrain", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--g-objective", default="fm", choices=["auto", "adv", "fm"])
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--out", default=None, help="dir for generated .mid files")
    args = ap.parse_args()

    import jax

    from music_tpu.data.midi import (
        build_meta_onehots, load_midi_dataset, midi_to_song_data,
    )
    from music_tpu.generate.crnngan_generate import generate
    from music_tpu.models import crnngan as cg
    from music_tpu.train.crnngan_train import (
        CRnnGanTrainConfig, CRnnGanTrainer, FeatureScaler,
    )

    t0 = time.time()
    tmp = Path(args.out) if args.out else Path(tempfile.mkdtemp(prefix="crnngan_"))
    corpus_dir = tmp / "corpus"
    rng = np.random.default_rng(0)
    synthesize_corpus(corpus_dir, args.songs, rng)

    data, metas = load_midi_dataset(corpus_dir, song_length=100)
    meta, genres, composers = build_meta_onehots(metas)
    assert len(data) == args.songs * len(PATTERNS), (len(data), args.songs)

    scaler = FeatureScaler(data)
    norm = scaler.transform(data).astype(np.float32)

    cfg = cg.CRnnGanConfig(meta_dim=meta.shape[1])  # hidden 350, noise 100
    tc = CRnnGanTrainConfig(cfg=cfg, batch_size=args.batch,
                            g_lr=args.lr, d_lr=args.lr,
                            g_objective=args.g_objective)
    tr = CRnnGanTrainer(tc, seed=0)

    # per-condition moment distance: generate 8 songs conditioned on each
    # (genre, composer) and score them against THAT composer's corpus rows
    # — the right reference (global moments mix four very different
    # registers), and simultaneously a test that the meta tensor steers
    # generation.  "contrast" = mean distance vs the OTHER composers'
    # corpora; conditioning works iff within < contrast.
    cond_rows, cond_data = [], []
    for genre, composer in PATTERNS:
        row = np.zeros((meta.shape[1],), np.float32)
        row[genres.index(genre)] = 1.0
        row[len(genres) + composers.index(composer)] = 1.0
        cond_rows.append(row)
        sel = [i for i, m in enumerate(metas)
               if m["genre"] == genre and m["composer"] == composer]
        cond_data.append(data[sel])

    def cond_distances(seed):
        within, contrast = [], []
        for ci, row in enumerate(cond_rows):
            ev = np.asarray(cg.generate(
                tr.g_params, jax.random.PRNGKey(seed * 31 + ci), cfg, batch=8,
                meta=jax.numpy.asarray(np.tile(row, (8, 1))),
            ))
            ev = scaler.inverse(ev)
            within.append(moment_distance(ev, cond_data[ci]))
            contrast.append(np.mean([
                moment_distance(ev, cond_data[cj])
                for cj in range(len(cond_rows)) if cj != ci
            ]))
        return round(float(np.mean(within)), 4), round(float(np.mean(contrast)), 4)

    d0 = cond_distances(1)

    pre_loss = tr.pretrain(norm, epochs=args.pretrain, meta=meta)
    d_pre = cond_distances(2)

    # adversarial training with periodic eval + best-checkpoint selection
    # (the standard GAN recipe: adversarial losses don't monotonically
    # improve sample statistics, so generation uses the best eval point)
    gl = dl = acc = float("nan")
    best = (d_pre[0], 0, jax.tree_util.tree_map(np.asarray, tr.g_params))
    trajectory = [(0,) + d_pre]
    for ep in range(args.epochs):
        gl, dl, acc = tr.gan_epoch(norm, meta=meta)
        if (ep + 1) % args.eval_every == 0 or ep + 1 == args.epochs:
            w, c = cond_distances(100 + ep)
            trajectory.append((ep + 1, w, c))
            if w < best[0]:
                best = (w, ep + 1, jax.tree_util.tree_map(np.asarray, tr.g_params))
    d_gan = cond_distances(3)
    tr.g_params = jax.tree_util.tree_map(jax.numpy.asarray, best[2])
    d_best = cond_distances(4)

    # conditioned generation -> real .mid -> re-parse round trip
    n_events = []
    for i, (genre, composer) in enumerate(PATTERNS):
        mid = tmp / f"gen_{genre}_{composer}.mid"
        row = np.zeros((meta.shape[1],), np.float32)
        row[genres.index(genre)] = 1.0
        row[len(genres) + composers.index(composer)] = 1.0
        generate(tr.g_params, cfg, mid, scaler=scaler, seed=10 + i,
                 meta=row)
        song = midi_to_song_data(mid)
        n_events.append(len(song))
    assert min(n_events) > 0, "generated MIDI files must re-parse to events"

    print(json.dumps({
        "metric": "crnngan_e2e_quality",
        "songs": int(len(data)),
        "pretrain_loss": round(float(pre_loss), 4),
        "gan_g_loss": round(float(gl), 4),
        "gan_d_loss": round(float(dl), 4),
        "d_real_acc": round(float(acc), 4),
        "moment_distance_init": {"within": d0[0], "contrast": d0[1]},
        "moment_distance_after_pretrain": {"within": d_pre[0], "contrast": d_pre[1]},
        "moment_distance_final_epoch": {"within": d_gan[0], "contrast": d_gan[1]},
        "moment_distance_best_ckpt": {"within": d_best[0], "contrast": d_best[1]},
        "best_ckpt_epoch": best[1],
        "eval_trajectory": [list(x) for x in trajectory],
        "conditioning_steers_generation": bool(d_best[0] < d_best[1]),
        "generated_events_reparsed": n_events,
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
