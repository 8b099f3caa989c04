"""LeakGAN full reference schedule with the target.py-faithful oracle
(VERDICT r2 action #2): oracle-NLL must now REGISTER quality.

Round 2 ran the full 80/50/800 schedule against a module-default-init
oracle whose NLL floor equals ln(V) — the metric had a 0.016-nat range.
With every oracle parameter N(0, 1.0) (leak_gan/target.py:30-32,
``oracle_init="normal"``, now the trainer default) the oracle distribution
is peaked: G starts far above the oracle's self-entropy and closes the gap
as it learns the oracle corpus, so the trajectory is meaningful.

Full scale: vocab 5258, 1720 leaked features, batch 64, rollout_num 4,
1024-sequence oracle corpus, 80 G-pretrain / 50 D-pretrain / 800
adversarial epochs (leak_gan/params/train_params.json).

Run: python -m benchmarks.leakgan_oracle_run [--smoke]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/leakgan_oracle")
    ap.add_argument("--pre-g", type=int, default=80)
    ap.add_argument("--pre-d", type=int, default=50)
    ap.add_argument("--adv", type=int, default=800)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--corpus", type=int, default=1024)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.pre_g, args.pre_d, args.adv, args.eval_every, args.corpus = 2, 2, 4, 2, 128

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from music_tpu.models import leakgan as lg
    from music_tpu.models import seqgan as sg
    from music_tpu.train.leakgan_train import LeakGanTrainConfig, LeakGanTrainer

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    tc = LeakGanTrainConfig(cfg=lg.LeakGanConfig())  # vocab 5258, oracle_init normal
    tr = LeakGanTrainer(tc, seed=233)
    corpus = tr.oracle_samples(args.corpus)

    # the oracle's own samples under itself = the target NLL (self-entropy)
    self_nll = float(
        np.mean([
            float(sg.generator_nll(
                tr.oracle_params,
                sg.generate(tr.oracle_params, jax.random.PRNGKey(i),
                            tr.oracle_cfg, tc.batch_size),
                tr.oracle_cfg,
            ))
            for i in range(8)
        ])
    )

    def nll_avg(n=8):
        return float(np.mean([tr.oracle_nll() for _ in range(n)]))

    traj = {"pretrain": [], "adv": []}
    nll0 = nll_avg()
    print(f"# init oracle NLL {nll0:.4f}; oracle self-NLL {self_nll:.4f}; "
          f"ln V {np.log(tc.cfg.vocab_size):.4f}", file=sys.stderr)

    done = 0
    while done < args.pre_g:
        e = min(10, args.pre_g - done)
        ml, wl = tr.pretrain_generator(corpus, epochs=e)
        done += e
        nll = nll_avg()
        traj["pretrain"].append({"epoch": done, "m_loss": round(ml, 4),
                                 "w_loss": round(wl, 4), "oracle_nll": round(nll, 4)})
        print(f"# pre_g {done}: w_loss {wl:.4f}, oracle NLL {nll:.4f}", file=sys.stderr)
    pre_nll = traj["pretrain"][-1]["oracle_nll"]

    dl = tr.pretrain_discriminator(corpus, epochs=args.pre_d)
    print(f"# pre_d {args.pre_d} epochs: d_loss {dl:.4f}", file=sys.stderr)

    best = float("inf")
    for ep in range(1, args.adv + 1):
        ml, wl, dlo = tr.adversarial_epoch(corpus, d_steps=5, d_epochs=3)
        if ep % args.eval_every == 0 or ep == 1:
            nll = nll_avg()
            best = min(best, nll)
            traj["adv"].append({"epoch": ep, "m_loss": round(ml, 4),
                                "w_loss": round(wl, 4), "d_loss": round(dlo, 4),
                                "oracle_nll": round(nll, 4)})
            print(f"# adv {ep}: oracle NLL {nll:.4f}", file=sys.stderr)

    (out_dir / "trajectory.json").write_text(json.dumps(traj))
    out = {
        "metric": "leakgan_oracle_nll_normal_init",
        "oracle_self_nll": round(self_nll, 4),
        "ln_vocab": round(float(np.log(tc.cfg.vocab_size)), 4),
        "init_oracle_nll": round(nll0, 4),
        "pretrain_oracle_nll": pre_nll,
        "best_adv_oracle_nll": round(best, 4),
        "final_adv_oracle_nll": traj["adv"][-1]["oracle_nll"] if traj["adv"] else None,
        "metric_range_nats": round(nll0 - best, 4),
        "schedule": f"{args.pre_g}/{args.pre_d}/{args.adv}",
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
