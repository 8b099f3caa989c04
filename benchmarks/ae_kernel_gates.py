"""Trained-margin hardware gates for the AE decode kernel modes (VERDICT r4 #2).

The WaveNet int8/bf16 modes were gated on a model trained to decisive
argmax margins (benchmarks/int8_decode_validation.py); the AE ports had
only an untrained-model compile gate (_hw_ae_int8_check — 98.5% agreement
that is argmax margin noise, not signal).  This script applies the repo's
own documented methodology (train first — ae_serving_validation) to the
AE kernels and GATES the numbers:

  1. Train the full-size reference AE (wavenet_autoencoder/model1.py:256-268
     workload: 40 blocks, bottleneck 512, pool 512) on two tones to
     decisive margins (same recipe as ae_serving_validation).
  2. int8 weight streaming (params) vs the f32 HBM kernel on
     ``dequantized_params(params)`` — the SAME quantized weights, so on
     trained margins token agreement must be 100% (gated).
  3. bf16 x 16 x G2 (the shipped AE serving headline mode) vs the f32 HBM
     kernel on ``params`` — recorded cross-dtype agreement (bf16 rounds
     weights + activations, so 100% is not expected; the number is the
     serving headline's accuracy statement).
  4. f32 HBM kernel vs the scan decoder — the exactness anchor (must be
     ~1.0 on hardware; interpret mode proves bit-exactness).
  5. Round-5 wide tile (bf16 x 32 x G1 + hbm-rings — what plan_ae_serving
     now emits for a 32-stream request, the bench.py/AEDecodeSession
     shape): GATED same-dtype agreement vs the narrow bf16 x 16 x G2 plan
     (the per-stream math is tile-shape-invariant — lanes carry the
     reduction, sublanes carry streams — so wide vs narrow must be 100%),
     plus int8-weight-streaming at the same wide shape vs bf16-on-
     dequantized (GATED same-dtype/same-shape, extends
     composed_capacity_r5's WaveNet methodology to the AE).

Run on a real TPU: ``python -m benchmarks.ae_kernel_gates``.
Prints one JSON line; artifact goes to benchmarks/artifacts/.
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
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--agree-steps", type=int, default=3072)
    ap.add_argument("--out", default="benchmarks/artifacts/ae_kernel_gates_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.generate.wavenet_ae_generate import _jit_encode
    from music_tpu.kernels import wavenet_ae_decode_hbm as hbm_k
    from music_tpu.models import wavenet_ae as ae

    t0 = time.time()
    cfg = ae.WaveNetAEConfig()
    sr = 16000

    # --- train to decisive margins (ae_serving_validation's recipe) -----
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

    for i in range(args.train_steps):
        rows = []
        for _ in range(4):
            c = codes[rng.integers(len(codes))]
            s = rng.integers(0, len(c) - W)
            rows.append(c[s : s + W])
        params, opt, loss = step(params, opt, jnp.asarray(np.stack(rows)))
        if (i + 1) % 200 == 0:
            print(f"# train step {i+1}: loss {float(loss):.4f} "
                  f"(t={time.time()-t0:.0f}s)", file=sys.stderr)
    out = {"metric": "ae_kernel_gates_trained",
           "train_steps": args.train_steps,
           "train_loss": round(float(loss), 4)}

    # --- shared prime/encoding (32 rows: two tones alternating) --------
    P = cfg.receptive_field + max(cfg.dilations)
    k = args.agree_steps
    src = np.stack([codes[i % 2][: P + k] for i in range(32)]).astype(np.int64)
    toks = jnp.asarray(src, jnp.int32)
    enc = _jit_encode(cfg)(params, toks)
    prime = toks[:, :P]

    def run(p, rows, wdt=None, dtype=jnp.float32, S=8, G=2, rings=False):
        return np.asarray(hbm_k.generate_tokens_fused_hbm(
            p, enc[:rows], prime[:rows], cfg=cfg, n_steps=k,
            n_streams=S, n_stream_groups=G, dtype=dtype, weight_dtype=wdt,
            rings_in_hbm=rings,
        ))

    def agreement(a, b, name):
        agr = float((a == b).mean())
        mm = [int(np.argmax(x != y)) if (x != y).any() else -1
              for x, y in zip(a, b)]
        print(f"# {name}: agreement {agr:.6f}, first mismatch {mm[:8]}",
              file=sys.stderr)
        return agr, mm

    # --- anchor: f32 HBM kernel vs scan decoder ------------------------
    ref_scan = np.asarray(ae.generate_tokens(
        params, enc[:2], prime[:2], jax.random.PRNGKey(0), cfg=cfg,
        n_steps=k, sample_mode="argmax",
    ))
    f32 = run(params, 16)
    a, mm = agreement(f32[:2], ref_scan, "f32-hbm vs scan")
    out["f32_vs_scan_agreement"] = round(a, 6)
    out["f32_vs_scan_first_mismatch"] = mm

    # --- GATE: int8 weight streaming vs f32 on dequantized params ------
    dq = hbm_k.dequantized_params(params, cfg)
    f32_dq = run(dq, 16)
    i8 = run(params, 16, wdt=jnp.int8)
    a, mm = agreement(i8, f32_dq, "int8 vs f32-on-dequantized (TRAINED)")
    out["int8_vs_f32dq_agreement"] = round(a, 6)
    out["int8_vs_f32dq_first_mismatch"] = mm
    int8_ok = a == 1.0

    # --- recorded: bf16 x 16 x G2 (serving headline) vs f32 ------------
    bf16 = run(params, 32, dtype=jnp.bfloat16, S=16, G=2)
    a, _ = agreement(bf16[:16], f32, "bf16x16xG2 vs f32 (cross-dtype)")
    out["bf16_vs_f32_agreement"] = round(a, 6)
    # end-to-end sanity for bf16: each stream must still reproduce a tone
    from music_tpu.ops.mulaw import mu_law_decode
    doms = []
    for row in (0, 1):
        audio = np.asarray(
            mu_law_decode(jnp.asarray(bf16[row]), 256), np.float64)
        spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
        spec[0] = 0.0
        doms.append(round(float(
            np.fft.rfftfreq(len(audio), 1.0 / sr)[int(np.argmax(spec))]), 1))
    out["bf16_dominant_hz"] = doms
    out["source_hz"] = [220.0, 330.0]

    # --- GATE: round-5 wide tile (bf16 x 32 x G1 + rings) --------------
    # plan_ae_serving's shape for a 32-stream bf16 request since the
    # stream-shape A/B (ae_hbm_shapes_ab_r5: S32xG1 850k vs S16xG2 687k
    # samples/s) — the bench.py ae_serving block and AEDecodeSession plan.
    wide_ok = True
    try:
        bf16_wide = run(params, 32, dtype=jnp.bfloat16, S=32, G=1,
                        rings=True)
        a, mm = agreement(bf16_wide, bf16,
                          "bf16x32xG1+rings vs bf16x16xG2 (same dtype)")
        out["bf16_wide_vs_narrow_agreement"] = round(a, 6)
        out["bf16_wide_vs_narrow_first_mismatch"] = mm[:8]
        wide_ok = a == 1.0
        i8_wide = run(params, 32, wdt=jnp.int8, dtype=jnp.bfloat16,
                      S=32, G=1, rings=True)
        # same compute dtype + same shape so the gate is exact: int8's
        # column-scale dequant must reproduce the bf16 kernel running on
        # pre-dequantized weights bit-for-bit (the WaveNet precedent:
        # composed_capacity_r5 agreement_int8_vs_bf16_dq = 1.0)
        bf16dq_wide = run(dq, 32, dtype=jnp.bfloat16, S=32, G=1,
                          rings=True)
        a, mm = agreement(i8_wide, bf16dq_wide,
                          "int8-bf16x32xG1+rings vs bf16-on-dequantized")
        out["int8_wide_vs_bf16dq_agreement"] = round(a, 6)
        out["int8_wide_vs_bf16dq_first_mismatch"] = mm[:8]
        wide_ok = wide_ok and a == 1.0
    except Exception as e:  # record a compile rejection, don't crash
        out["wide_tile_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        wide_ok = False

    out.update({
        "agree_steps": k,
        "ok": bool(int8_ok and wide_ok
                   and out["f32_vs_scan_agreement"] >= 0.999),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    })
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
