"""Composed capacity ceiling: int8 weight streaming x HBM rings x large G
(VERDICT r4 #3/#4).

Both capacity features ship measured ALONE (128 streams via HBM rings;
int8 weight-only at bf16 parity) but their composition — the reason
capacity features exist — was never demonstrated.  This run answers the
serving question directly: how many concurrent real-time streams does ONE
chip support on the full-size reference model (the workload
wavenet/fast_generate.py:144-186 serves one-stream-per-process), with
everything on: int8 streamed weights (4x HBM weight traffic reduction),
bf16 x 16 stream tiles, HBM ring state, batched ring DMAs, stream groups.

Protocol:
  1. Train the full-size WaveNet to decisive argmax margins (the
     int8_decode_validation recipe: pure tone, 300 Adam steps).
  2. Agreement gates on trained margins at the composed config:
     - composed (int8 weights) vs the same bf16/rings config on
       ``dequantized_params`` — the weight-only-quantization exactness
       class; expect ~1.0 (kernel computes bf16(q)@x * s, reference
       computes bf16(q*s)@x — one bf16 rounding apart, so gated at
       >= 0.999 rather than bitwise).
     - composed vs the f32 HBM-rings kernel on raw params — the
       end-to-end cross-dtype accuracy statement (recorded).
     - per-stream dominant-frequency check of the composed audio.
  3. Throughput ladder over G (16 bf16 streams per group): adjacent
     timed draws with fresh nonce inputs; the capacity number is the
     largest G where every stream still decodes >= 16,000 samples/s
     (faster than real time at 16 kHz).

Run on a real TPU: ``python -m benchmarks.composed_capacity_validation``.
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
    ap.add_argument("--agree-steps", type=int, default=3072)
    ap.add_argument("--bench-steps", type=int, default=8192)
    ap.add_argument("--shapes", default="16x8,128x1,128x2",
                    help="SxG ladder rungs (wide tiles per the round-5 "
                         "shape A/B; 128x2 = 256 streams)")
    ap.add_argument("--out",
                    default="benchmarks/artifacts/composed_capacity_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.kernels import wavenet_decode_hbm as hbm_k
    from music_tpu.models import wavenet as wn
    from music_tpu.ops.mulaw import mu_law_decode

    t0 = time.time()
    cfg = wn.WaveNetConfig()
    sr, tone = 16000, 220.0
    S = 16  # bf16 native tile height
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
    out = {"metric": "composed_capacity_validation",
           "train_loss": round(float(loss), 4)}

    P = cfg.receptive_field + max(cfg.dilations)

    def composed(p, n_steps, prime, wdt, dtype, S=S, G=None):
        if G is None:
            G = prime.shape[0] // S
        return hbm_k.generate_tokens_fused_hbm(
            p, prime, cfg=cfg, n_steps=n_steps,
            n_streams=S, n_stream_groups=G, dtype=dtype, weight_dtype=wdt,
            rings_in_hbm=True, batched_ring_dma=True,
        )

    # --- agreement gates at G=2 (32 streams; the numerics don't depend
    # on G — every group runs the same chain on its own rows) ------------
    k = args.agree_steps
    B = 2 * S
    # distinct phase offsets per row so rows aren't trivially identical
    prime = jnp.stack([
        jnp.asarray(codes[i * 7 : i * 7 + P], jnp.int32) for i in range(B)
    ])
    comp = np.asarray(composed(params, k, prime, jnp.int8, jnp.bfloat16))
    dq = hbm_k.dequantized_params(params, cfg)
    bf16_dq = np.asarray(composed(dq, k, prime, None, jnp.bfloat16))
    agr_q = float((comp == bf16_dq).mean())
    f32 = np.asarray(composed(params, k, prime, None, jnp.float32, S=8))
    agr_x = float((comp == f32).mean())
    print(f"# int8-composed vs bf16-on-dq: {agr_q:.6f}; vs f32: {agr_x:.6f}",
          file=sys.stderr)
    audio = np.asarray(mu_law_decode(jnp.asarray(comp[0]), 256), np.float64)
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    spec[0] = 0.0
    dom = float(np.fft.rfftfreq(len(audio), 1.0 / sr)[int(np.argmax(spec))])
    out.update({
        "agreement_int8_vs_bf16_dq": round(agr_q, 6),
        "agreement_int8_vs_f32": round(agr_x, 6),
        "composed_dominant_hz": round(dom, 1),
        "source_hz": tone,
    })

    # --- throughput ladder over (S, G) shapes ---------------------------
    n = args.bench_steps
    ladder = []
    knee = None
    for shape in args.shapes.split(","):
        Sx, G = (int(v) for v in shape.split("x"))
        B = G * Sx
        cap = hbm_k.max_stream_groups_hbm_rings(
            cfg, n_streams=Sx, dtype=jnp.bfloat16, n_steps=n)
        if G > cap:
            ladder.append({"S": Sx, "G": G, "streams": B,
                           "skipped": f"past planner cap {cap}"})
            continue
        try:
            def run(seed):
                pr = jnp.asarray(
                    np.stack([codes[(seed + i) % 1024 : (seed + i) % 1024 + P]
                              for i in range(B)]), jnp.int32)
                return np.asarray(composed(params, n, pr, jnp.int8,
                                           jnp.bfloat16, S=Sx, G=G))

            nonce = int(time.time() * 1000) % (1 << 20)
            run(nonce)
            run(nonce + 1)  # 2nd call can also pay compile cost — warm twice
            times = []
            for i in range(3):
                t1 = time.perf_counter()
                run(nonce + 2 + i)
                times.append(time.perf_counter() - t1)
            dt = float(np.median(times))
            row = {
                "S": Sx, "G": G, "streams": B,
                "us_per_step": round(dt / n * 1e6, 1),
                "total_samples_per_sec": round(B * n / dt, 0),
                "samples_per_sec_stream": round(n / dt, 0),
                "realtime_x": round(n / dt / sr, 2),
            }
        except Exception as e:  # a Mosaic rejection is a result, not a crash
            row = {"S": Sx, "G": G, "streams": B,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        ladder.append(row)
        print(f"# ladder {row}", file=sys.stderr)
        if row.get("samples_per_sec_stream", 0) >= sr and (
                knee is None or row["streams"] > knee["streams"]):
            knee = row
    out["ladder"] = ladder
    if knee is not None:
        out["max_realtime_streams"] = knee["streams"]
        out["max_realtime_total_samples_per_sec"] = knee["total_samples_per_sec"]
    out.update({
        "ok": bool(agr_q >= 0.999 and abs(dom - tone) < 10.0
                   and knee is not None),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    })
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
