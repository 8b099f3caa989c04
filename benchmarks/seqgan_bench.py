"""SeqGAN adversarial-epoch benchmark: music_tpu on TPU vs torch on CPU.

BASELINE.json target: >= 20x faster than the PyTorch CPU reference for one
adversarial epoch (1 PG G-step with 16x19 MC rollouts + 5x3 D retraining
over 1024 positive / 1024 regenerated negative samples, batch 64).

Usage: python benchmarks/seqgan_bench.py [--skip-torch]
Prints one JSON line {metric, value(seconds), unit, vs_baseline(speedup)}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_ours(generated_num=1024, rollout_num=16, d_steps=5, d_epochs=3) -> float:
    from music_tpu.train.seqgan_train import SeqGanConfig, SeqGanTrainer

    cfg = SeqGanConfig(generated_num=generated_num, rollout_num=rollout_num)
    tr = SeqGanTrainer(cfg, seed=int(time.time()) % 100000)
    positive = tr.oracle_samples(generated_num)
    # compile all phase programs outside the timed region (one-time cost);
    # shapes and static args must match the timed call exactly
    tr.adversarial_epoch(positive, g_steps=1, d_steps=d_steps, d_epochs=d_epochs)
    float(tr.oracle_nll())
    t0 = time.perf_counter()
    tr.adversarial_epoch(positive, g_steps=1, d_steps=d_steps, d_epochs=d_epochs)
    # force ALL device work (both G and D sides) to reach the host
    np.asarray(tr.d_params["out"]["w"]).sum()
    float(tr.oracle_nll())
    return time.perf_counter() - t0


def main():
    ours = run_ours()
    if "--skip-torch" in sys.argv:
        torch_dt = None
    else:
        from benchmarks.seqgan_torch_baseline import run as run_torch

        torch_dt = run_torch()
    speedup = (torch_dt / ours) if torch_dt else None
    print(
        json.dumps(
            {
                "metric": "seqgan_adversarial_epoch_wallclock",
                "value": round(ours, 3),
                "unit": "seconds",
                "vs_baseline": round(speedup, 2) if speedup else None,
                "torch_cpu_seconds": round(torch_dt, 2) if torch_dt else None,
            }
        )
    )


if __name__ == "__main__":
    main()
