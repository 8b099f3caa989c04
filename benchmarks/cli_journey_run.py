"""One-command user-journey proof (VERDICT r4 #5).

Drives the framework's public CLI end-to-end exactly as a reference user
would (the reference workflow: wavenet/data/generate_audio_dataset.py +
wav_to_numpy.py -> wavenet/train.py:76-226 -> fast_generate.py:144-186 ->
vis/visualize.py), asserting the artifacts at every hop:

  1. a directory of source .wav files (synthesized tones — the journey's
     "recordings"),
  2. ``python -m music_tpu dataset build-audio`` -> pieces + np_audio.pkl,
  3. ``python -m music_tpu wavenet train`` -> rotating checkpoints +
     loss_log.log with decreasing loss (reference log format),
  4. ``python -m music_tpu wavenet generate --num N`` -> N .wav files
     through the serving planner,
  5. ``python -m music_tpu vis loss`` -> loss.png.

Every hop is a real subprocess of ``python -m music_tpu`` (the user
surface, not library calls).  The pieces are all individually tested;
this run proves the COMPOSED workflow on hardware.

Run: python -m benchmarks.cli_journey_run [--workdir DIR]
Prints one JSON line; artifact to benchmarks/artifacts/.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def sh(args_list, cwd, t0):
    """Run one CLI hop; echo + time it; raise on failure."""
    print(f"# [{time.time()-t0:7.1f}s] $ {' '.join(args_list)}", file=sys.stderr)
    env = dict(os.environ)
    # extend (never replace) PYTHONPATH: the axon plugin path must survive
    env["PYTHONPATH"] = f"{REPO}" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    r = subprocess.run(
        [sys.executable, "-m", "music_tpu", *args_list],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=3000,
    )
    sys.stderr.write("\n".join("#   " + l for l in r.stdout.splitlines()[-4:]) + "\n")
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        raise RuntimeError(f"CLI hop failed: {args_list[:2]}")
    return r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/cli_journey_r5")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--num", type=int, default=4)
    ap.add_argument("--duration", type=float, default=2.0)
    ap.add_argument("--out", default="benchmarks/artifacts/cli_journey_r5.json")
    args = ap.parse_args()

    t0 = time.time()
    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    out = {"metric": "cli_journey", "workdir": str(work)}

    # --- hop 0: the user's recordings (synthesized tones) ---------------
    import wave

    sr = 16000
    src_dir = work / "recordings"
    src_dir.mkdir(exist_ok=True)
    t = np.arange(sr * 21) / sr
    for i, f in enumerate((220.0, 277.2, 330.0, 440.0)):
        audio = (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)
        with wave.open(str(src_dir / f"tone{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(audio.tobytes())

    # --- hop 1: dataset build-audio -------------------------------------
    data_dir = work / "data"
    sh(["dataset", "build-audio", "--audio-dir", str(src_dir),
        "--out-dir", str(data_dir)], work, t0)
    assert (data_dir / "np_audio.pkl").exists(), "np_audio.pkl missing"
    n_pieces = len(list(data_dir.glob("*.wav")))
    out["dataset_pieces"] = n_pieces

    # --- hop 2: wavenet train (reference params, journey-local paths) ---
    pdir = work / "params"
    pdir.mkdir(exist_ok=True)
    ref_params = json.loads(
        (REPO / "music_tpu/params/wavenet/wavenet_params.json").read_text())
    (pdir / "wavenet_params.json").write_text(json.dumps(ref_params))
    (pdir / "dataset_params.json").write_text(json.dumps({
        "audio_path": str(data_dir / "np_audio.pkl"),
        "window_length": 40000,
        "batch_size": 4,
    }))
    (pdir / "train_params.json").write_text(json.dumps({
        "optimizer": "adam", "learning_rate": 2e-4,
        "num_epochs": args.epochs, "print_every": 10, "seed": 0,
        "log_dir": str(work / "logs"), "restore_dir": str(work / "ckpts"),
        "max_check_points": 3,
    }))
    sh(["wavenet", "train", "--params-dir", str(pdir)], work, t0)
    log = (work / "logs" / "loss_log.log").read_text().splitlines()
    losses = [float(m.group(1)) for l in log
              if (m := re.search(r"Average loss is ([0-9.eE+-]+)", l))]
    assert losses, f"no loss lines parsed from {log[:3]}"
    ckpts = sorted((work / "ckpts").glob("step_*"))
    assert ckpts, "no checkpoints written"
    assert len(ckpts) <= 3, f"rotation failed: {len(ckpts)} checkpoints"
    out.update({
        "train_steps_logged": len(losses),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "loss_min": round(min(losses), 4),
        "checkpoints": [p.name for p in ckpts],
    })

    # --- hop 3: wavenet generate --num N (serving planner path) ---------
    gen_dir = work / "generated"
    sh(["wavenet", "generate", "--checkpoint", str(work / "ckpts"),
        "--num", str(args.num), "--duration", str(args.duration),
        "--out", str(gen_dir)], work, t0)
    wavs = sorted(gen_dir.glob("*.wav"))
    assert len(wavs) == args.num, f"expected {args.num} wavs, got {len(wavs)}"
    doms, uniqs = [], []
    for p in wavs:
        with wave.open(str(p)) as w:
            n = w.getnframes()
            audio = np.frombuffer(w.readframes(n), np.int16) / 32767.0
        assert n >= int(args.duration * sr) - 1, f"{p.name}: {n} frames"
        uniqs.append(int(len(np.unique(np.round(audio * 127)))))
        spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
        spec[0] = 0.0
        doms.append(round(float(
            np.fft.rfftfreq(len(audio), 1.0 / sr)[int(np.argmax(spec))]), 1))
    out.update({
        "generated_wavs": len(wavs),
        "generated_frames": int(args.duration * sr),
        "unique_codes_per_wav": uniqs,
        "dominant_hz_per_wav": doms,  # informational: 40 epochs is a
        # workflow proof, not a quality run (those live elsewhere)
    })

    # --- hop 4: vis loss -------------------------------------------------
    sh(["vis", "loss", "--log", str(work / "logs" / "loss_log.log"),
        "--out", str(work / "loss.png")], work, t0)
    assert (work / "loss.png").stat().st_size > 0, "loss.png empty"

    out.update({
        "ok": bool(losses[-1] < losses[0] and len(wavs) == args.num
                   and min(uniqs) > 1),
        "wall_s": round(time.time() - t0, 1),
    })
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
