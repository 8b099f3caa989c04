"""Quantify the real-corpus eval-NLL ceiling for LeakGAN (VERDICT r4 #1).

The stabilizer sweeps converge on adversarial best ~6.806-6.809 vs the
MLE pretrain's own best ~6.809 (epoch ~40, before it overfits to 6.827
by epoch 80) — the open question is whether that ~6.80 plateau is the
10k-poem corpus's ceiling or the 32-hidden model's.  This run separates
the two: MLE-ONLY generator pretraining at 1x / 2x / 4x hidden width
(worker + manager LSTMs and worker embedding scaled; D untouched — the
teacher-forced eval never trains against D), eval-NLL every 5 epochs
with best-epoch tracking over a 2x-longer horizon (160 epochs).

Readings:
  - best(2x) ~= best(1x): capacity is NOT binding -> the corpus is the
    ceiling; divergence #19 closes with the measured number.
  - best(2x) << best(1x): the model is binding; the adversarial-gain
    target needs a wider generator, not a better stabilizer.

Run: python -m benchmarks.leakgan_mle_ceiling [--widths 1,2,4]
Prints one JSON line; artifact to benchmarks/artifacts/.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

from benchmarks.leakgan_quality_run import load_real_corpus


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="1,2,4")
    ap.add_argument("--epochs", type=int, default=160)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--out",
                    default="benchmarks/artifacts/leakgan_mle_ceiling_r5.json")
    args = ap.parse_args()

    import jax

    from music_tpu.models import leakgan as lg
    from music_tpu.train.leakgan_train import LeakGanTrainConfig, LeakGanTrainer

    t0 = time.time()
    train, evals, _ = load_real_corpus()
    vocab = int(max(train.max(), evals.max())) + 1

    results = {}
    for w in [int(x) for x in args.widths.split(",")]:
        cfg = lg.LeakGanConfig(
            vocab_size=vocab,
            worker_emb_dim=32 * w, worker_hidden=32 * w,
            manager_hidden=32 * w,
        )
        tr = LeakGanTrainer(LeakGanTrainConfig(cfg=cfg), seed=233)
        best, best_ep, traj = float("inf"), -1, []
        for ep in range(args.eval_every, args.epochs + 1, args.eval_every):
            ml, wl = tr.pretrain_generator(train, epochs=args.eval_every)
            nll = tr.eval_nll(evals)
            traj.append({"epoch": ep, "eval_nll": round(nll, 4),
                         "w_loss": round(wl, 4)})
            if nll < best:
                best, best_ep = nll, ep
            print(f"# width x{w} ep {ep}: eval_nll {nll:.4f} "
                  f"(best {best:.4f}@{best_ep}, t={time.time()-t0:.0f}s)",
                  file=sys.stderr)
        n_params = sum(
            int(np.prod(v.shape))
            for v in jax.tree_util.tree_leaves(tr.g_params)
        )
        results[f"x{w}"] = {
            "hidden": 32 * w,
            "g_params": n_params,
            "best_eval_nll": round(best, 4),
            "best_epoch": best_ep,
            "final_eval_nll": traj[-1]["eval_nll"],
            "trajectory": traj,
        }

    out = {
        "metric": "leakgan_mle_ceiling",
        "corpus_rows": int(len(train)),
        "vocab_size": vocab,
        "epochs": args.epochs,
        "results": results,
        "wall_s": round(time.time() - t0, 1),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
