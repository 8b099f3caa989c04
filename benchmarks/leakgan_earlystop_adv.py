"""Adversarial LeakGAN from an EARLY-STOPPED pretrain optimum (round 5).

The MLE-ceiling probe (leakgan_mle_ceiling) found the reference's
80-epoch G-pretrain schedule OVERSHOOTS: eval NLL bottoms at ~6.77
around epoch 25-30 and overfits to ~6.83-6.85 by epoch 80
(leak_gan/params/train_params.json hardcodes 80).  Every stabilizer
sweep to date started the adversarial phase from the overfit epoch-80
state and plateaued at ~6.808 — i.e. the adversarial phase was
RECOVERING pretrain overfit, not adding quality.

This run asks the decisive question: starting from the pretrain
OPTIMUM, does stabilized adversarial training beat the best MLE can do?

Protocol:
  1. Pretrain G in 5-epoch chunks, eval each chunk, checkpoint at every
     improvement; stop after ``--patience`` stale evals; restore best.
  2. Pretrain D 50 epochs (reference schedule), save the shared step_0,
     record post-pretrain eval NLL (the trained-D baseline all deltas
     are measured against, matching the sweep convention).
  3. Run stabilized variants (advlr0.03 / advlr0.03+dfreeze10 and the
     reference protocol as control) for --epochs from that state.

Run: python -m benchmarks.leakgan_earlystop_adv
Prints one JSON line; artifact to benchmarks/artifacts/.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from benchmarks.leakgan_quality_run import load_real_corpus

VARIANTS = [
    # (name, adv_lr_scale, d_freeze_refresh)
    ("reference", 1.0, 0),
    ("advlr0.03", 0.03, 0),
    ("advlr0.03+dfreeze10", 0.03, 10),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpts",
                    default="benchmarks/artifacts/leakgan_earlystop/ckpts")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--patience", type=int, default=3)
    ap.add_argument("--max-pre-g", type=int, default=80)
    ap.add_argument("--variants", default=None)
    ap.add_argument("--order", choices=["gd", "dg"], default="gd",
                    help="pretrain order: gd = G then D (the repo's quality-"
                         "run order), dg = D then G (the REFERENCE's order, "
                         "leak_gan/train.py:386-403 — G pretrains against "
                         "the trained D's leaked features, so the eval "
                         "metric is consistent from pretrain through the "
                         "adversarial phase)")
    ap.add_argument("--out",
                    default="benchmarks/artifacts/leakgan_earlystop_adv_r5.json")
    args = ap.parse_args()

    from music_tpu.core import checkpoint as ckpt_lib
    from music_tpu.models import leakgan as lg
    from music_tpu.train.leakgan_train import LeakGanTrainConfig, LeakGanTrainer

    t0 = time.time()
    train, evals, _ = load_real_corpus()
    vocab = int(max(train.max(), evals.max())) + 1
    ck = Path(args.ckpts)

    pre_meta = {}
    if not (ck / "step_0" / "arrays.npz").exists():
        cfg = lg.LeakGanConfig(vocab_size=vocab)
        tr = LeakGanTrainer(LeakGanTrainConfig(cfg=cfg), seed=233)
        dl = None
        if args.order == "dg":  # the reference's order: D first, on
            # negatives from the init G (leak_gan/train.py:386-392)
            dl = tr.pretrain_discriminator(train, epochs=50)
            print(f"# pre-D (reference order) d_loss {dl:.4f} "
                  f"(t={time.time()-t0:.0f}s)", file=sys.stderr)
        best, best_ep, stale, traj = float("inf"), 0, 0, []
        ep = 0
        while ep < args.max_pre_g:
            tr.pretrain_generator(train, epochs=args.eval_every)
            ep += args.eval_every
            nll = tr.eval_nll(evals)
            traj.append({"epoch": ep, "eval_nll": round(nll, 4)})
            print(f"# pre-G ep {ep}: eval_nll {nll:.4f} "
                  f"(t={time.time()-t0:.0f}s)", file=sys.stderr)
            if nll < best:
                best, best_ep, stale = nll, ep, 0
                tr.save(ck / "g_best", step=ep, max_checkpoints=1)
            else:
                stale += 1
                if stale >= args.patience:
                    break
        # restore the optimum (full state at the best eval: G + its opts
        # and whatever D it was evaluated against — init D under gd,
        # the pretrained D under dg)
        state, _ = ckpt_lib.restore_or_init(ck / "g_best", tr.state())
        tr.g_params, tr.d_params = state["g_params"], state["d_params"]
        tr.m_opt, tr.w_opt, tr.d_opt = (
            state["m_opt"], state["w_opt"], state["d_opt"])
        print(f"# restored pretrain optimum: {best:.4f} @ ep {best_ep}",
              file=sys.stderr)
        if args.order == "gd":
            dl = tr.pretrain_discriminator(train, epochs=50)
        tr.save(ck, step=0)
        pre_meta = {"order": args.order,
                    "pre_g_best_ep": best_ep,
                    "pre_g_best_eval_nll": round(best, 4),
                    "pre_g_trajectory": traj,
                    "pre_d_loss": round(float(dl), 4)}
        (ck / "pre_meta.json").write_text(json.dumps(pre_meta))
    else:
        pre_meta = json.loads((ck / "pre_meta.json").read_text())

    picked = [v for v in VARIANTS
              if args.variants is None or v[0] in args.variants.split(",")]
    results, pre_nll = {}, None
    for name, adv_scale, d_freeze in picked:
        cfg = lg.LeakGanConfig(vocab_size=vocab)
        tr = LeakGanTrainer(
            LeakGanTrainConfig(cfg=cfg, adv_lr_scale=adv_scale), seed=233)
        state = ckpt_lib.restore(args.ckpts, tr.state(), step=0)
        tr.g_params, tr.d_params = state["g_params"], state["d_params"]
        tr.m_opt, tr.w_opt, tr.d_opt = (
            state["m_opt"], state["w_opt"], state["d_opt"])
        if pre_nll is None:
            pre_nll = tr.eval_nll(evals)
            print(f"# post-pretrain (trained-D) eval NLL {pre_nll:.4f}",
                  file=sys.stderr)
        best, traj = float("inf"), []
        for ep in range(1, args.epochs + 1):
            tr.adversarial_epoch(train, d_steps=5, d_epochs=3,
                                 d_freeze_refresh=d_freeze)
            if ep % args.eval_every == 0 or ep == 1:
                nll = tr.eval_nll(evals)
                best = min(best, nll)
                traj.append({"epoch": ep, "eval_nll": round(nll, 4)})
                print(f"# {name} ep {ep}: eval_nll {nll:.4f} "
                      f"(t={time.time()-t0:.0f}s)", file=sys.stderr)
        results[name] = {
            "adv_lr_scale": adv_scale, "d_freeze_refresh": d_freeze,
            "best_eval_nll": round(best, 4),
            "final_eval_nll": traj[-1]["eval_nll"],
            "delta_vs_pretrain": round(best - pre_nll, 4),
            "trajectory": traj,
        }

    winner = min(results, key=lambda k: results[k]["best_eval_nll"])
    out = {
        "metric": "leakgan_earlystop_adv",
        **pre_meta,
        "pretrain_eval_nll": round(float(pre_nll), 4),
        "epochs": args.epochs,
        "results": results,
        "winner": winner,
        "wall_s": round(time.time() - t0, 1),
    }
    out.pop("pre_g_trajectory", None)
    out["pre_g_trajectory"] = pre_meta.get("pre_g_trajectory")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
