"""Hardware validation: the AE serving surface at realistic request scale.

`wavenet_ae_generate.generate_batch` is the autoencoder counterpart of the
WaveNet serving planner (chunked fused decodes, VMEM-budgeted kernel
selection, HBM-ring upgrade).  Interpret tests prove token exactness; this
script proves the PLAN compiles and runs on hardware at real request
scale: n concurrent reconstructions of multi-second clips through the
full-size reference AE (40 blocks, pool 512 — at 16 f32 streams the
request needs two stream groups, past the resident kernel's one-group
VMEM budget, so the conditioned HBM-streaming kernel with interleaved
stream groups carries the batch), chunked over multiple kernel calls
per stream.

A short trained-model agreement check (fused HBM plan vs the scan
decoder on the same prime/encoding) guards against conditioning-clock or
chunk-hand-off regressions that interpret DMAs cannot catch.

Run: python -m benchmarks.ae_serving_validation [--n 16] [--duration 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--duration", type=float, default=4.0)
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--agree-steps", type=int, default=3072)
    args = ap.parse_args()

    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.generate.wavenet_ae_generate import _jit_encode, generate_batch
    from music_tpu.kernels import wavenet_ae_decode as res_k
    from music_tpu.kernels import wavenet_ae_decode_hbm as hbm_k
    from music_tpu.models import wavenet_ae as ae

    t0 = time.time()
    cfg = ae.WaveNetAEConfig()
    sr = 16000

    # train briefly on two tones so argmax margins are confident — the
    # agreement check needs decisive logits (docs/DIVERGENCES.md "Fused
    # decode vs scan": float-accumulation order can flip coin-toss argmax)
    t = np.arange(sr * 6) / sr
    clips = [0.5 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0)]
    codes = [mu_law_encode_np(c, cfg.quantization_channel) for c in clips]
    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    W = cfg.receptive_field + 2048
    rng = np.random.default_rng(0)

    @jax.jit
    def step(params, opt, tokens):
        loss, grads = jax.value_and_grad(ae.loss_fn)(params, tokens, cfg)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(args.train_steps):
        rows = []
        for _ in range(4):
            c = codes[rng.integers(len(codes))]
            s = rng.integers(0, len(c) - W)
            rows.append(c[s : s + W])
        params, opt, loss = step(params, opt, jnp.asarray(np.stack(rows)))
    print(f"# trained {args.train_steps} steps, loss {float(loss):.4f}",
          file=sys.stderr)

    out = {"metric": "ae_serving_validation",
           "train_loss": round(float(loss), 4)}

    # --- trained-model agreement triangle: scan vs resident vs HBM ---
    # The scan decoder is ground truth.  The resident kernel is the
    # interpret-proven path that also ran the round-2 hardware quality
    # run; the HBM kernel shares its ring arithmetic but streams weights
    # and conditioning tables.  first_mismatch tells margin-noise (late,
    # singular — docs/DIVERGENCES.md "Fused decode vs scan") from a real
    # ordering bug (early, structural).
    P = cfg.receptive_field + max(cfg.dilations)
    k = args.agree_steps
    src2 = np.stack([c[: P + k] for c in codes]).astype(np.int64)
    toks = jnp.asarray(src2, jnp.int32)
    enc = _jit_encode(cfg)(params, toks)
    ref = np.asarray(ae.generate_tokens(
        params, enc, toks[:, :P], jax.random.PRNGKey(0), cfg=cfg,
        n_steps=k, sample_mode="argmax",
    ))
    for name, fn in [
        ("resident", res_k.generate_tokens_fused),
        ("hbm", functools.partial(
            hbm_k.generate_tokens_fused_hbm, n_stream_groups=1)),
    ]:
        got = np.asarray(fn(params, enc, toks[:, :P], cfg=cfg, n_steps=k))[:2]
        agree = float((got == ref).mean())
        mm = [int(np.argmax(g != r)) if (g != r).any() else -1
              for g, r in zip(got, ref)]
        out[f"{name}_vs_scan_agreement"] = round(agree, 6)
        out[f"{name}_first_mismatch"] = mm
        print(f"# {name} vs scan: agreement {agree:.6f}, "
              f"first mismatch {mm}", file=sys.stderr)
    agree = out["hbm_vs_scan_agreement"]

    # --- the serving request: n concurrent multi-second reconstructions ---
    # first request pays the one-time jit/Mosaic compiles; the second is
    # the steady-state serving wall
    n_steps = int(args.duration * sr)
    srcs = np.stack([
        clips[i % 2][: n_steps] for i in range(args.n)
    ]).astype(np.float32)
    # different source rows per request — the relay result-cache would
    # serve a repeated (executable, inputs) pair and fake the warm timing
    srcs_warm = np.stack([
        clips[(i + 1) % 2][: n_steps] for i in range(args.n)
    ]).astype(np.float32)
    t1 = time.time()
    generate_batch(cfg=cfg, params=params, source_audios=srcs)
    cold_wall = time.time() - t1
    out["cold_wall_s"] = round(cold_wall, 1)
    # CLAUDE.md: the SECOND call can also pay a multi-second cost — warm
    # twice before timing (fresh inputs each time for the relay cache)
    generate_batch(cfg=cfg, params=params,
                   source_audios=np.roll(srcs, 7, axis=1))
    t1 = time.time()
    audio = generate_batch(cfg=cfg, params=params, source_audios=srcs_warm)
    wall = time.time() - t1
    assert audio.shape == (args.n, n_steps), audio.shape
    uniq = [len(np.unique(np.round(a[8000:] * 127))) for a in audio]
    weight_bytes = sum(int(np.prod(v.shape)) * 4
                       for v in jax.tree_util.tree_leaves(params))
    out.update({
        "streams": args.n,
        "steps_per_stream": n_steps,
        "weights_mb_f32": round(weight_bytes / 1e6, 1),
        "plan_groups_cap": hbm_k.max_stream_groups(cfg, n_steps=16384),
        "wall_s": round(wall, 1),
        "total_samples_per_sec": round(args.n * n_steps / wall, 0),
        "min_unique_codes_per_stream": int(min(uniq)),
        "ok": bool(agree >= 0.999 and min(uniq) > 4),
        "wall_total_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
