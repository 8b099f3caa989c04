"""LeakGAN on the reference's REAL 11k-poem corpus (VERDICT r2 action #1).

The only real-world dataset in the entire reference is
/root/reference/leak_gan/data/: corpus.npy [11274, 20] (1-based char ids),
chars.pkl (5,258-char vocab), with shipped train/eval/gen/test splits — and
the workload's actual product is generated poem text (encode.py:51-62
pretty-printer, train.py:157-165 sample files).  This run consumes those
shipped data artifacts (read-only; data, not code) and executes the full
reference schedule (train_params.json: 80 G-pretrain, 50 D-pretrain, 800
adversarial epochs) at reference scale on one TPU chip, tracking:

  - eval-set NLL (eval_corpus.npy): teacher-forced per-token generator NLL
    on held-out poems — the real-data quality metric
  - generated poems via data/tokens.tensor_to_poem at pretrain end and at
    the best-eval-NLL adversarial checkpoint

Note a reference defect this run must diverge from: corpus token ids run
1..5258 but leak_gan_params.json sets vocab_size 5258 (ids 0..5257) — the
reference's own Worker embedding would index out of range on its own corpus.
We set vocab_size = max_id + 1 = 5259 (0 = start/pad token, encode.py pads
with 0).

Run: python -m benchmarks.leakgan_quality_run [--smoke]
Progress streams to --out/progress.jsonl; checkpoints every --ckpt-every
adversarial epochs allow resume after an interrupted run.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pickle
import sys
import time
from pathlib import Path

import numpy as np

REF_DATA = Path("/root/reference/leak_gan/data")


def load_real_corpus():
    train = np.load(REF_DATA / "train_corpus.npy").astype(np.int32)
    evals = np.load(REF_DATA / "eval_corpus.npy").astype(np.int32)
    with (REF_DATA / "chars.pkl").open("rb") as f:
        chars = pickle.load(f)
    return train, evals, chars


def pretrain_phase(tr, train, evals, pre_g, pre_d, ckpt_dir, *,
                   on_chunk=None, write_poems=None):
    """The quality run's EXACT pretrain block, factored so the stabilizer
    sweep regenerates step_0 through the same code path (ADVICE r4 medium):
    G pretraining in epochs=10 chunks with an eval-NLL call between chunks,
    one 64-poem sample write, ONE epochs=pre_d D call, then save(step=0).
    The per-call ``tr.keys.next()`` consumption order is part of the
    contract — any drift makes a regenerated step_0 a different pretrain
    state than a quality-run-produced one."""
    pretrain = []
    done = 0
    while done < pre_g:
        e = min(10, pre_g - done)
        ml, wl = tr.pretrain_generator(train, epochs=e)
        done += e
        nll = tr.eval_nll(evals)
        pretrain.append(
            {"epoch": done, "m_loss": round(ml, 4), "w_loss": round(wl, 4),
             "eval_nll": round(nll, 4)})
        if on_chunk:
            on_chunk(pretrain[-1])
    if write_poems:
        write_poems("poems_pretrain")
    else:
        # key-consumption parity with the quality run's poem write
        tr.generate_samples(64)
    dl = tr.pretrain_discriminator(train, epochs=pre_d)
    tr.save(ckpt_dir, step=0)
    return pretrain, dl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/leakgan_quality")
    ap.add_argument("--pre-g", type=int, default=80)
    ap.add_argument("--pre-d", type=int, default=50)
    ap.add_argument("--adv", type=int, default=800)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--interleave", type=int, default=0,
                    help="teacher-forcing epochs interleaved after each "
                         "adversarial G update (the LeakGAN paper's "
                         "stabilizer; 0 = the reference's plain alternation)")
    ap.add_argument("--early-stop", type=int, default=0,
                    help="stop the adversarial phase after this many "
                         "consecutive evals without an eval-NLL "
                         "improvement (0 = run the full horizon)")
    ap.add_argument("--adv-lr-scale", type=float, default=1.0,
                    help="adversarial-only Manager/Worker LR scale "
                         "(LeakGanTrainConfig.adv_lr_scale; 1.0 = the "
                         "reference protocol)")
    ap.add_argument("--reward-delta", type=float, default=16.0,
                    help="rank-rescale temperature (16.0 = the reference's "
                         "near-binary rewards; smaller keeps mid-rank "
                         "gradient signal)")
    ap.add_argument("--d-freeze-refresh", type=int, default=0,
                    help="refresh the G update's frozen leaked-feature/"
                         "reward critic every K adversarial epochs "
                         "(0 = live critic, the reference protocol)")
    ap.add_argument("--pre-g-early-stop", type=int, default=0,
                    help="early-stop the G pretrain at its eval-NLL optimum "
                         "with this patience (in 5-epoch chunks, checkpoint-"
                         "restore at best; 0 = the reference's fixed "
                         "--pre-g epochs).  The reference's fixed 80-epoch "
                         "schedule overshoots the optimum by ~0.06 nats "
                         "(benchmarks/leakgan_mle_ceiling; round-5 finding)")
    ap.add_argument("--smoke", action="store_true",
                    help="2/2/4 epochs on 256 rows — wiring check")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env pin only yields to "
                         "jax.config.update)")
    args = ap.parse_args()
    if args.smoke:
        args.pre_g, args.pre_d, args.adv, args.eval_every, args.ckpt_every = 2, 2, 4, 2, 4

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from music_tpu.data.tokens import tensor_to_poem
    from music_tpu.models import leakgan as lg
    from music_tpu.train.leakgan_train import LeakGanTrainConfig, LeakGanTrainer

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    prog = (out_dir / "progress.jsonl").open("a")

    def log(rec):
        rec["t"] = round(time.time() - t0, 1)
        prog.write(json.dumps(rec) + "\n")
        prog.flush()
        print(f"# {rec}", file=sys.stderr)

    t0 = time.time()
    train, evals, chars = load_real_corpus()
    if args.smoke:
        train = train[:256]
    vocab = int(max(train.max(), evals.max())) + 1  # 5259 — see module docstring

    cfg = lg.LeakGanConfig(vocab_size=vocab)  # all other leak_gan_params defaults
    tc = LeakGanTrainConfig(
        cfg=cfg, adv_lr_scale=args.adv_lr_scale,
        reward_delta=args.reward_delta,
    )
    # ^ lrs/decay per train_params.json; adv_lr_scale opt-in (round 4)
    tr = LeakGanTrainer(tc, seed=233)         # train_params.json seed

    def write_poems(name, n=64):
        samples = tr.generate_samples(n, out_path=out_dir / f"{name}.npy")
        text = "\n\n".join(tensor_to_poem(row, chars) for row in samples)
        (out_dir / f"{name}.txt").write_text(text)
        return samples

    traj = {"pretrain": [], "adv": []}
    nll0 = tr.eval_nll(evals)
    log({"phase": "init", "eval_nll": round(nll0, 4),
         "ln_vocab": round(float(np.log(vocab)), 4), "corpus": len(train)})

    # ---- G pretraining (80 epochs, eval every 10) ----------------------
    ckpt_dir = out_dir / "ckpts"
    start_adv = 0
    resume = (out_dir / "resume.json")
    if resume.exists():
        state = json.loads(resume.read_text())
        start_adv = state["adv_done"]
        tr.restore(ckpt_dir)
        traj = json.loads((out_dir / "trajectory.json").read_text())
        log({"phase": "resume", "adv_done": start_adv})
    elif args.pre_g_early_stop:
        # round-5 variant: stop the G pretrain at its eval optimum
        # (checkpoint-restore at best) instead of the reference's fixed
        # epoch count; keys diverge from pretrain_phase's parity contract,
        # which is why this is opt-in
        from music_tpu.core import checkpoint as _ck

        best, best_ep, stale, ep = float("inf"), 0, 0, 0
        while ep < args.pre_g:
            ml, wl = tr.pretrain_generator(train, epochs=5)
            ep += 5
            nll = tr.eval_nll(evals)
            traj["pretrain"].append(
                {"epoch": ep, "m_loss": round(ml, 4), "w_loss": round(wl, 4),
                 "eval_nll": round(nll, 4)})
            log({"phase": "pre_g", **traj["pretrain"][-1]})
            if nll < best:
                best, best_ep, stale = nll, ep, 0
                tr.save(ckpt_dir / "g_best", step=ep, max_checkpoints=1)
            else:
                stale += 1
                if stale >= args.pre_g_early_stop:
                    break
        state, _ = _ck.restore_or_init(ckpt_dir / "g_best", tr.state())
        tr.g_params, tr.d_params = state["g_params"], state["d_params"]
        tr.m_opt, tr.w_opt, tr.d_opt = (
            state["m_opt"], state["w_opt"], state["d_opt"])
        log({"phase": "pre_g_best", "epoch": best_ep,
             "eval_nll": round(best, 4)})
        write_poems("poems_pretrain")
        dl = tr.pretrain_discriminator(train, epochs=args.pre_d)
        tr.save(ckpt_dir, step=0)
        log({"phase": "pre_d", "epochs": args.pre_d, "d_loss": round(dl, 4)})
    else:
        traj["pretrain"], dl = pretrain_phase(
            tr, train, evals, args.pre_g, args.pre_d, ckpt_dir,
            on_chunk=lambda rec: log({"phase": "pre_g", **rec}),
            write_poems=write_poems,
        )
        log({"phase": "pre_d", "epochs": args.pre_d, "d_loss": round(dl, 4)})

    # ---- adversarial (800 epochs, 5x3 D retraining each) ---------------
    best = {"eval_nll": float("inf"), "epoch": -1}
    stale_evals = 0
    stopped_early = None
    for ep in range(start_adv + 1, args.adv + 1):
        ml, wl, dl = tr.adversarial_epoch(
            train, d_steps=5, d_epochs=3,
            interleave_supervision=args.interleave,
            d_freeze_refresh=args.d_freeze_refresh,
        )
        if ep % args.eval_every == 0 or ep == 1:
            nll = tr.eval_nll(evals)
            stale_evals = 0 if nll < best["eval_nll"] else stale_evals + 1
            traj["adv"].append(
                {"epoch": ep, "m_loss": round(ml, 4), "w_loss": round(wl, 4),
                 "d_loss": round(dl, 4), "eval_nll": round(nll, 4)})
            log({"phase": "adv", **traj["adv"][-1]})
            if nll < best["eval_nll"]:
                best = {"eval_nll": round(nll, 4), "epoch": ep}
                tr.save(ckpt_dir, step=ep)
                write_poems("poems_best")
                # restore_or_init loads the LATEST checkpoint, so resume
                # state must track EVERY save — otherwise a resumed run
                # replays epochs on further-trained params
                (out_dir / "trajectory.json").write_text(json.dumps(traj))
                resume.write_text(json.dumps({"adv_done": ep}))
        if ep % args.ckpt_every == 0:
            tr.save(ckpt_dir, step=ep)
            (out_dir / "trajectory.json").write_text(json.dumps(traj))
            resume.write_text(json.dumps({"adv_done": ep}))
        if args.early_stop and stale_evals >= args.early_stop:
            stopped_early = ep
            log({"phase": "early_stop", "epoch": ep,
                 "stale_evals": stale_evals,
                 "best_eval_nll": best["eval_nll"]})
            break

    write_poems("poems_final")
    (out_dir / "trajectory.json").write_text(json.dumps(traj))

    pre_nll = traj["pretrain"][-1]["eval_nll"] if traj["pretrain"] else None
    out = {
        "metric": "leakgan_real_corpus_eval_nll",
        "corpus": "reference leak_gan/data (11k Chinese poems)",
        "vocab_size": vocab,
        "init_eval_nll": round(nll0, 4),
        "pretrain_eval_nll": pre_nll,
        "best_adv_eval_nll": best["eval_nll"],
        "best_adv_epoch": best["epoch"],
        "final_eval_nll": traj["adv"][-1]["eval_nll"] if traj["adv"] else None,
        "schedule": f"{args.pre_g}/{args.pre_d}/{args.adv}",
        "interleave_supervision": args.interleave,
        "adv_lr_scale": args.adv_lr_scale,
        "reward_delta": args.reward_delta,
        "d_freeze_refresh": args.d_freeze_refresh,
        "pre_g_early_stop": args.pre_g_early_stop,
        "pre_g_best_eval_nll": min(
            (r["eval_nll"] for r in traj["pretrain"]), default=None),
        "early_stop": args.early_stop,
        "stopped_early_at": stopped_early,
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
