"""Full-scale SeqGAN oracle-NLL quality run (VERDICT r2 action #2).

The SeqGAN protocol's entire point (SeqGan_Pytorch/train.py:61-97 + the
SeqGAN paper's synthetic experiment) is that adversarial training beats the
MLE-only generator on oracle NLL — the reference never measured it (its
schedule is 1 MLE epoch + 2 adversarial batches).  This run executes the
paper-scale protocol on one TPU chip:

  - oracle: N(0,1)-initialized LSTM (leak_gan/target.py:30-32 init — the
    reference's own module-default oracle is near-uniform and pins NLL at
    ln(V); docs/DIVERGENCES.md #17)
  - vocab 5000, seq 20, batch 64, rollout 16, 9,984-sequence oracle corpus
  - MLE pretrain (fused epochs) with oracle-NLL trajectory
  - adversarial rounds (PG step with batched MC rollouts + 5x3 D retraining)
    with oracle-NLL trajectory

Prints one JSON line; writes trajectory + generated-sample artifacts next to
--out.  Run: python -m benchmarks.seqgan_quality_run
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax


def oracle_nll_avg(tr, n_batches: int = 8) -> float:
    """Average the per-batch oracle NLL over several sample batches (one
    64-row batch is noisy: +-0.02 nats)."""
    return float(np.mean([tr.oracle_nll() for _ in range(n_batches)]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/seqgan_quality")
    ap.add_argument("--mle-epochs", type=int, default=120)
    ap.add_argument("--adv-rounds", type=int, default=100)
    ap.add_argument("--corpus", type=int, default=9984)
    ap.add_argument("--eval-every", type=int, default=5)
    args = ap.parse_args()

    from music_tpu.train.seqgan_train import SeqGanConfig, SeqGanTrainer, write_samples

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    cfg = SeqGanConfig()  # vocab 5000, seq 20, batch 64, rollout 16
    tr = SeqGanTrainer(cfg, seed=233)
    positive = tr.oracle_samples(args.corpus)

    traj = {"mle": [], "adv": []}
    nll0 = oracle_nll_avg(tr)
    print(f"# init oracle NLL {nll0:.4f} (ln V = {np.log(cfg.g.vocab_size):.4f})",
          file=sys.stderr)

    # ---- MLE pretraining, trajectory every 10 epochs -------------------
    chunk = 10
    done = 0
    while done < args.mle_epochs:
        e = min(chunk, args.mle_epochs - done)
        mle_loss = tr.pretrain_generator(positive, epochs=e)
        done += e
        nll = oracle_nll_avg(tr)
        traj["mle"].append({"epoch": done, "mle_loss": round(mle_loss, 4),
                            "oracle_nll": round(nll, 4)})
        print(f"# MLE epoch {done}: loss {mle_loss:.4f}, oracle NLL {nll:.4f}",
              file=sys.stderr)
    mle_only_nll = traj["mle"][-1]["oracle_nll"]
    mle_best_nll = min(r["oracle_nll"] for r in traj["mle"])

    # ---- D pretraining (seqgan.py:83-93 schedule) ----------------------
    d_loss = tr.train_discriminator(positive, d_steps=5, epochs=3)
    print(f"# D pretrain loss {d_loss:.4f}", file=sys.stderr)

    # ---- adversarial rounds -------------------------------------------
    best_adv = float("inf")
    for r in range(1, args.adv_rounds + 1):
        g_loss, d_loss = tr.adversarial_epoch(positive, g_steps=1,
                                              d_steps=5, d_epochs=3)
        if r % args.eval_every == 0 or r == 1:
            nll = oracle_nll_avg(tr)
            best_adv = min(best_adv, nll)
            traj["adv"].append({"round": r, "g_loss": round(g_loss, 4),
                                "d_loss": round(d_loss, 4),
                                "oracle_nll": round(nll, 4)})
            print(f"# adv round {r}: g {g_loss:.4f}, d {d_loss:.4f}, "
                  f"oracle NLL {nll:.4f}", file=sys.stderr)

    samples = tr.generator_samples(64)
    write_samples(out_dir / "adv_samples.txt", samples)
    (out_dir / "trajectory.json").write_text(json.dumps(traj, indent=1))

    out = {
        "metric": "seqgan_oracle_nll",
        "init_oracle_nll": round(nll0, 4),
        "mle_only_oracle_nll": mle_only_nll,
        "mle_best_oracle_nll": mle_best_nll,
        "adv_best_oracle_nll": round(best_adv, 4),
        "adv_final_oracle_nll": traj["adv"][-1]["oracle_nll"],
        "adv_beats_mle": bool(best_adv < mle_best_nll),
        "ln_vocab": round(float(np.log(cfg.g.vocab_size)), 4),
        "mle_epochs": args.mle_epochs,
        "adv_rounds": args.adv_rounds,
        "corpus_size": args.corpus,
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
