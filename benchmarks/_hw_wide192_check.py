"""Hardware gate for the round-5b S192 serving tile (planner change).

The composed-capacity knee probe (composed_capacity_r5b.json) measured the
HBM-rings step cost FLAT from S128 to S192 (65.7 -> 65.0 µs/step on the
full-size model) while a second 128-wide group doubles it (124 µs), so
``plan_fused_serving`` now widens 128 < n <= 192 requests to one S=192
tile instead of paying S128 x G2.  This gate proves the new shape on a
real chip with the repo's trained-margin methodology (the WaveNet int8
gate precedent, benchmarks/int8_decode_validation.py):

  1. Train the full-size WaveNet (reference: wavenet/fast_generate.py
     serves this model one stream per process) to decisive argmax margins.
  2. Drive the PUBLIC path — ``generate_batch`` with a ragged 160-stream
     argmax request — and require 100% token agreement vs the ``lax.scan``
     ground-truth decoder (this exercises the plan, the row padding to the
     192 tile, and the chunked dispatch end to end).
  3. Gate the direct kernel at S192xG1+rings: bf16 vs scan (trained-margin
     cross-dtype agreement, 1.0 expected) and int8 weight streaming vs
     scan on ``dequantized_params`` (weight-only exactness class).
  4. Record the same-process S128 vs S192 µs/step A/B that justifies the
     planner rule.

Run on a real TPU: ``python -m benchmarks._hw_wide192_check``.
Prints one JSON line; artifact to benchmarks/artifacts/.
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
    ap.add_argument("--train-steps", type=int, default=300)
    ap.add_argument("--agree-steps", type=int, default=2048)
    ap.add_argument("--bench-steps", type=int, default=8192)
    ap.add_argument("--out",
                    default="benchmarks/artifacts/wide192_gate_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.generate.wavenet_generate import (
        generate_batch, plan_fused_serving,
    )
    from music_tpu.kernels import wavenet_decode_hbm as hbm_k
    from music_tpu.models import wavenet as wn
    from music_tpu.ops.mulaw import mu_law_decode

    t0 = time.time()
    cfg = wn.WaveNetConfig()
    sr, tone = 16000, 220.0
    t = np.arange(sr * 4) / sr
    codes = mu_law_encode_np(0.5 * np.sin(2 * np.pi * tone * t), 256)

    # --- train to decisive margins (int8_decode_validation recipe) ------
    W = cfg.receptive_field + 8192
    rng = np.random.default_rng(0)
    params = wn.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(2e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, toks):
        l, g = jax.value_and_grad(wn.loss_fn)(p, toks, cfg)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    loss = None
    for _ in range(args.train_steps):
        s = rng.integers(0, len(codes) - W, size=4)
        batch = jnp.asarray(np.stack([codes[i : i + W] for i in s]), jnp.int32)
        params, opt, loss = step(params, opt, batch)
    print(f"# trained {args.train_steps} steps, loss {float(loss):.4f} "
          f"(t={time.time()-t0:.0f}s)", file=sys.stderr)
    out = {"metric": "wide192_gate",
           "train_loss": round(float(loss), 4)}

    P = cfg.receptive_field + max(cfg.dilations)
    n = 160  # a ragged midsize request — pads to one 192 tile
    prime = jnp.stack([
        jnp.asarray(codes[i * 7 : i * 7 + P], jnp.int32) for i in range(n)
    ])

    # --- the plan itself ------------------------------------------------
    _, S_plan, g_plan, rings_plan = plan_fused_serving(
        cfg, 16, jnp.bfloat16, args.agree_steps, n
    )
    out["plan"] = {"S": S_plan, "g_max": g_plan, "rings_in_hbm": rings_plan}
    print(f"# plan for n={n}: S={S_plan} g={g_plan} rings={rings_plan}",
          file=sys.stderr)

    # --- scan ground truth (argmax; trained margins make it decisive) ---
    k = args.agree_steps
    ref = np.asarray(wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=cfg, n_steps=k, prime_len=P, sample_mode="argmax",
    ))

    # --- public path: generate_batch drives the new plan end to end -----
    # (returns µ-law-DECODED audio; the decode table is deterministic, so
    # audio equality <=> token equality)
    pub = np.asarray(generate_batch(
        cfg=cfg, params=params, n=n, start_pieces=np.asarray(prime),
        duration=k / sr, dtype=jnp.bfloat16, sample_mode="argmax", seed=1,
    ))
    ref_audio = np.asarray(mu_law_decode(jnp.asarray(ref), 256))
    agr_pub = float((pub == ref_audio).mean())
    out["agreement_generate_batch_vs_scan"] = round(agr_pub, 6)
    print(f"# generate_batch(n=160) vs scan: {agr_pub:.6f}", file=sys.stderr)

    # --- direct kernel: bf16 S192xG1+rings vs scan -----------------------
    def wide(p, wdt, steps, pr):
        return hbm_k.generate_tokens_fused_hbm(
            p, pr, cfg=cfg, n_steps=steps,
            n_streams=192, n_stream_groups=1, dtype=jnp.bfloat16,
            weight_dtype=wdt, rings_in_hbm=True, batched_ring_dma=True,
        )

    bf16 = np.asarray(wide(params, None, k, prime))
    agr_bf16 = float((bf16 == ref).mean())
    dq = hbm_k.dequantized_params(params, cfg)
    ref_dq = np.asarray(wn.generate_tokens(
        dq, prime, jax.random.PRNGKey(0),
        cfg=cfg, n_steps=k, prime_len=P, sample_mode="argmax",
    ))
    i8 = np.asarray(wide(params, jnp.int8, k, prime))
    agr_i8 = float((i8 == ref_dq).mean())
    out["agreement_bf16_s192_vs_scan"] = round(agr_bf16, 6)
    out["agreement_int8_s192_vs_scan_dq"] = round(agr_i8, 6)
    print(f"# bf16 S192 vs scan: {agr_bf16:.6f}; int8 S192 vs scan-on-dq: "
          f"{agr_i8:.6f}", file=sys.stderr)

    # --- same-process µs/step A/B: the planner-relevant shapes -----------
    # S192xG1 is what the new rule emits for 128 < n <= 192; S128xG2 is
    # what those requests paid before; S128xG1 anchors the draw's speed.
    ns = args.bench_steps
    timings = {}
    for S, G in ((128, 1), (192, 1), (128, 2)):
        B = S * G

        def run(seed, S=S, G=G, B=B):
            pr = jnp.asarray(
                np.stack([codes[(seed + i) % 1024 : (seed + i) % 1024 + P]
                          for i in range(B)]), jnp.int32)
            return np.asarray(hbm_k.generate_tokens_fused_hbm(
                params, pr, cfg=cfg, n_steps=ns,
                n_streams=S, n_stream_groups=G, dtype=jnp.bfloat16,
                rings_in_hbm=True, batched_ring_dma=True,
            ))

        nonce = int(time.time() * 1000) % (1 << 20)
        run(nonce)
        run(nonce + 1)  # the second call can also pay compile cost
        dts = []
        for i in range(3):
            t1 = time.perf_counter()
            run(nonce + 2 + i)
            dts.append(time.perf_counter() - t1)
        dt = float(np.median(dts))
        timings[f"S{S}xG{G}"] = {
            "us_per_step": round(dt / ns * 1e6, 1),
            "total_samples_per_sec": round(B * ns / dt, 0),
        }
        print(f"# S{S}xG{G}: {timings[f'S{S}xG{G}']}", file=sys.stderr)
    out["timings"] = timings
    out["midsize_speedup_s192g1_vs_s128g2"] = round(
        timings["S128xG2"]["us_per_step"]
        / timings["S192xG1"]["us_per_step"], 2
    )

    out.update({
        "ok": bool(
            S_plan == 192 and rings_plan
            and agr_pub == 1.0 and agr_bf16 == 1.0 and agr_i8 >= 0.999
        ),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    })
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
