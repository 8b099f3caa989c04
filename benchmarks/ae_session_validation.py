"""Hardware validation: AEDecodeSession (per-stream utterance clocks).

The AE kernels' per-stream ``pos_offset`` vector (the AEDecodeSession
enabler) is interpret-tested for exactness; this script proves it
compiles and holds on real hardware: a briefly-trained full-size AE
runs staggered-join reconstruction streams and each stream's session
output must agree with its uninterrupted single-call decode (decisive
argmax margins make agreement exact).  Two blocks:

  1. the original 2-stream staggered join on a ``kernel="hbm"``-pinned
     session (the auto plan now keeps one-group requests on the resident
     kernel — its budget is exact, and the full-size AE's DECODE-KERNEL
     weights fit one VMEM group), cross-checked against the RESIDENT
     kernel's single-call decode — a cross-kernel agreement;
  2. NEW (round 4): capacity 16 -> n_stream_groups=2 on the HBM kernel —
     12 streams joining across calls, each vs its uninterrupted
     single-call HBM decode (VERDICT r3 #2's "Done" criterion).

Run: python -m benchmarks.ae_session_validation
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--steps-per-call", type=int, default=4096)
    ap.add_argument("--calls", type=int, default=3)
    args = ap.parse_args()
    if args.calls < 2:
        ap.error("--calls must be >= 2 (stream 1 joins one step late)")

    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.generate.serving import AEDecodeSession
    from music_tpu.generate.wavenet_ae_generate import _jit_encode
    from music_tpu.kernels.wavenet_ae_decode import generate_tokens_fused
    from music_tpu.kernels.wavenet_ae_decode_hbm import (
        generate_tokens_fused_hbm,
    )
    from music_tpu.models import wavenet_ae as ae

    t0 = time.time()
    cfg = ae.WaveNetAEConfig()
    sr = 16000
    t = np.arange(sr * 6) / sr
    clips = [0.5 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0, 440.0, 550.0)]
    codes = [mu_law_encode_np(c, cfg.quantization_channel) for c in clips]

    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    W = cfg.receptive_field + 2048
    rng = np.random.default_rng(0)

    @jax.jit
    def train_step(params, opt, tokens):
        loss, grads = jax.value_and_grad(ae.loss_fn)(params, tokens, cfg)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(args.train_steps):
        # cover ALL clips: block 2's streams reconstruct codes[2]/codes[3]
        # too, and an untrained clip decodes with ~0 argmax margins — then
        # chunk-boundary re-prime FP differences flip ~1% of tokens and
        # fake a kernel mismatch (the CLAUDE.md margin-noise trap)
        rows = [codes[rng.integers(len(codes))][s : s + W]
                for s in rng.integers(0, len(codes[0]) - W, 4)]
        params, opt, loss = train_step(params, opt, jnp.asarray(np.stack(rows)))
    print(f"# trained, loss {float(loss):.4f}", file=sys.stderr)

    k = args.steps_per_call
    # kernel="hbm" pin: keep block 1 a CROSS-kernel agreement (the auto
    # plan serves one-group full-size requests from the resident kernel)
    sess = AEDecodeSession(cfg, params, capacity=8, steps_per_call=k,
                           kernel="hbm")
    got = {0: [], 1: []}
    t1 = time.time()
    a = sess.add(codes[0])
    got[0].append(sess.step()[a])            # compile + first step
    b = sess.add(codes[1])                   # staggered join
    for _ in range(args.calls - 1):
        out = sess.step()
        got[0].append(out[a])
        got[1].append(out[b])
    serve_wall = time.time() - t1

    out = {"metric": "ae_session_validation",
           "train_loss": round(float(loss), 4),
           "steps_per_call": k}
    ok = True
    for i, sid_calls in ((0, args.calls), (1, args.calls - 1)):
        toks = jnp.asarray(codes[i], jnp.int32)[None]
        enc = _jit_encode(cfg)(params, toks)
        P = cfg.receptive_field + max(cfg.dilations)
        ref = np.asarray(generate_tokens_fused(
            params, enc, toks[:, :P], cfg=cfg, n_steps=k * sid_calls,
        ))[0]
        mine = np.concatenate(got[i])
        agree = float((mine == ref).mean())
        out[f"stream{i}_agreement"] = round(agree, 6)
        ok = ok and agree == 1.0
        print(f"# stream {i}: session vs single-call agreement {agree:.6f}",
              file=sys.stderr)
    out["session_kernel"] = getattr(sess._fused, "__name__", "?")
    out["session_extra"] = dict(sess._extra)

    # block 2 (round 4): capacity 16 -> G=2 HBM session, 12 staggered
    # streams, each vs its uninterrupted single-call HBM decode
    sess2 = AEDecodeSession(cfg, params, capacity=16, steps_per_call=k)
    out["hbm_session_capacity"] = sess2.capacity
    out["hbm_session_extra"] = dict(sess2._extra)
    n_streams = 12
    calls = args.calls
    joins = [0] * 6 + [1] * 4 + [2] * 2  # join call per stream
    got2 = {i: [] for i in range(n_streams)}
    sids2 = {}
    t2 = time.time()
    for call in range(calls):
        for i in range(n_streams):
            if joins[i] == call:
                sids2[i] = sess2.add(codes[i % len(codes)])
        step_out = sess2.step()
        for i, sid in sids2.items():
            got2[i].append(step_out[sid])
    serve2_wall = time.time() - t2
    total_samples = sum(len(v) * k for v in got2.values())

    hbm_ok = True
    refs = {}
    for i in range(n_streams):
        n_calls_i = calls - joins[i]
        key = (i % len(codes), n_calls_i)
        if key not in refs:
            toks = jnp.asarray(codes[key[0]], jnp.int32)[None]
            enc = _jit_encode(cfg)(params, toks)
            P = cfg.receptive_field + max(cfg.dilations)
            refs[key] = np.asarray(generate_tokens_fused_hbm(
                params, enc, toks[:, :P], cfg=cfg, n_steps=k * n_calls_i,
            ))[0]
        agree = float((np.concatenate(got2[i]) == refs[key]).mean())
        hbm_ok = hbm_ok and agree == 1.0
        if agree != 1.0:
            out[f"hbm_stream{i}_agreement"] = round(agree, 6)
        print(f"# hbm stream {i}: agreement {agree:.6f}", file=sys.stderr)
    out["hbm_session_all_exact"] = bool(hbm_ok)
    out["hbm_session_samples_per_sec"] = round(total_samples / serve2_wall, 1)
    ok = ok and hbm_ok

    out.update({
        "all_exact": bool(ok),
        "serve_wall_s": round(serve_wall, 1),
        "hbm_serve_wall_s": round(serve2_wall, 1),
        "wall_total_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
