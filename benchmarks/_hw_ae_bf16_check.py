"""Hardware gate + A/B: bf16x16 AE serving (round 4).

The conditioned AE kernels now take ``n_streams`` (8 f32 / 16 bf16 —
the WaveNet kernels' native-tile rule).  On the REFERENCE-SIZE AE
(12 MB) through the HBM-streaming kernel this halves the streamed
weight bytes per decoded sample and doubles sublane occupancy, so
bf16x16xG1 should decode 16 streams markedly faster than f32x8xG2.

Checks:
  1. bf16x16 compiles and runs on hardware with per-stream clocks;
  2. row independence holds bitwise (a 5-stream call == rows 0-4 of a
     16-stream call with identical inputs);
  3. same-process A/B: 16 streams via f32x8xG2 vs bf16x16xG1.

Run: python -m benchmarks._hw_ae_bf16_check
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from music_tpu.kernels.wavenet_ae_decode_hbm import (
        generate_tokens_fused_hbm,
    )
    from music_tpu.models import wavenet_ae as ae

    cfg = ae.WaveNetAEConfig()
    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    P = cfg.receptive_field + max(cfg.dilations)
    n_steps = 2048
    pool = cfg.en_pool_kernel_size
    F = (P + n_steps + 3 * pool) // pool + 2

    rng = np.random.default_rng(0)
    enc = jnp.asarray(
        rng.standard_normal((16, F, cfg.en_bottleneck_width)) * 0.3, jnp.float32
    )
    prime = jnp.asarray(rng.integers(0, cfg.quantization_channel, (16, P)), jnp.int32)
    offs = jnp.asarray([(11 * i) % (2 * pool) for i in range(16)], jnp.int32)

    def run(mode, lo, hi, seed):
        e = enc[lo:hi] + 1e-6 * seed  # fresh inputs (relay result cache)
        if mode == "bf16":
            kw = dict(n_streams=16, n_stream_groups=1, dtype=jnp.bfloat16)
        else:
            kw = dict(n_streams=8, n_stream_groups=2, dtype=jnp.float32)
        t0 = time.time()
        out = np.asarray(generate_tokens_fused_hbm(
            params, e, prime[lo:hi], cfg=cfg, n_steps=n_steps,
            pos_offset=offs[lo:hi], **kw,
        ))
        return out, time.time() - t0

    # 1+2: compile + row independence, bitwise
    full, t_c = run("bf16", 0, 16, 0)
    part, _ = run("bf16", 0, 5, 0)
    rows_ok = bool(np.array_equal(part, full[:5]))
    print(f"# bf16x16 compile {t_c:.1f}s; 5-row vs 16-row bitwise={rows_ok}",
          file=sys.stderr)

    # 3: adjacent A/B, two draws each, fresh inputs per call
    f32_c, _ = run("f32", 0, 16, 1)  # compile the f32 program
    times = {"bf16": [], "f32": []}
    for i in (2, 3):
        for mode in ("bf16", "f32"):
            _, dt = run(mode, 0, 16, i)
            times[mode].append(dt)
    best = {m: min(v) for m, v in times.items()}
    tot = {m: 16 * n_steps / best[m] for m in best}
    print(f"# A/B 16 streams: bf16x16xG1 {tot['bf16']:.0f}/s "
          f"vs f32x8xG2 {tot['f32']:.0f}/s "
          f"(speedup {tot['bf16']/tot['f32']:.2f}x)", file=sys.stderr)

    print(json.dumps({
        "metric": "ae_hbm_bf16x16_hw",
        "ok": rows_ok,
        "row_independence_bitwise": rows_ok,
        "total_samples_per_sec": {m: round(v, 1) for m, v in tot.items()},
        "speedup_bf16_vs_f32": round(tot["bf16"] / tot["f32"], 3),
        "streams": 16,
        "n_steps_per_call": n_steps,
    }))
    return 0 if rows_ok else 1


if __name__ == "__main__":
    sys.exit(main())
