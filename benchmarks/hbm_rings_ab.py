"""Same-process A/B: batched vs per-stream-group HBM ring-state DMAs
(VERDICT r2 action #4 / STATUS r3 candidate #2).

Round 2 measured ~19 µs marginal step cost per extra serving group in
`rings_in_hbm` mode.  The step body already round-robins groups within each
layer (the verdict's literal suggestion); the actual per-group overhead is
the per-(dilation-group x stream-group) staging DMA traffic: at G=8 with 5
HBM dilation groups, 40 tap DMAs in + 40 ring writes out + their semaphore
waits per step.  ``batched_ring_dma=True`` re-packs the HBM ring state
slot-major so each step needs ONE [G, S, W] DMA in + out per dilation
group (5 + 5 at any G).

Run: python -m benchmarks.hbm_rings_ab [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.kernels.wavenet_decode_hbm import generate_tokens_fused_hbm
from music_tpu.models import wavenet as wn

FULL = wn.WaveNetConfig()
SCALED = wn.WaveNetConfig(
    filter_width=2,
    dilations=(1, 2, 4, 8, 16, 32, 64, 128, 256, 512) * 4,
    dilation_channels=64,
    residual_channels=64,
    skip_channels=1024,
    quantization_channels=256,
    use_bias=False,
)


def bench(cfg, params, G, batched, n_steps=8192, n_iters=3, S=16):
    P = cfg.receptive_field + max(cfg.dilations)
    fn = functools.partial(
        generate_tokens_fused_hbm, cfg=cfg, n_steps=n_steps, n_streams=S,
        n_stream_groups=G, dtype=jnp.bfloat16, rings_in_hbm=True,
        batched_ring_dma=batched,
    )

    def run(seed):
        prime = jax.random.randint(
            jax.random.PRNGKey(seed), (G * S, P), 0, cfg.quantization_channels
        )
        return np.asarray(fn(params, prime))

    nonce = int(time.time() * 1000) % 2**30
    run(nonce)
    run(nonce + 1)
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        run(nonce + 2 + i)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "S": S, "G": G, "batched": batched, "streams": G * S,
        "us_per_step": round(dt / n_steps * 1e6, 1),
        "total_samples_per_sec": round(G * S * n_steps / dt, 0),
    }


def shapes_main():
    """Stream-SHAPE split A/B at fixed total streams (VERDICT r4 #3).

    Round-3/4 A/Bs proved the marginal serving-group cost is small-matmul
    THROUGHPUT-bound, not DMA-bound: at S=16/group, every per-group matmul
    uses 16 sublane rows out of the MXU's 128-deep row stream, and G
    independent chains multiply the op count instead of the operand size.
    The kernel is shape-generic in (n_streams, n_stream_groups), so the
    lever is simply a WIDER tile per group at fixed total streams — the
    round-1 "32/64-stream rejection" was the fully-RESIDENT kernel; this
    sweep probes and measures the HBM kernel at S up to 128.  Compile
    rejections are recorded per shape, not fatal.

    Run: python -m benchmarks.hbm_rings_ab --shapes
    """
    out = {"metric": "hbm_rings_shapes_ab", "results": {}}
    plans = [
        ("full", FULL, [(16, 8), (32, 4), (64, 2), (128, 1)]),
        ("scaled", SCALED, [(16, 6), (32, 3), (48, 2), (96, 1)]),
    ]
    for name, cfg, shapes in plans:
        params = wn.init_params(jax.random.PRNGKey(0), cfg)
        rows = []
        for S, G in shapes:
            try:
                r = bench(cfg, params, G, True, S=S)
            except Exception as e:  # Mosaic rejection is a RESULT here
                r = {"S": S, "G": G, "streams": S * G,
                     "error": f"{type(e).__name__}: {str(e)[:300]}"}
            rows.append(r)
            print(f"# {name} {r}", file=sys.stderr)
        out["results"][name] = rows

    # the RESIDENT kernel's round-1 "32/64-stream rejection" is consistent
    # with plain VMEM overflow (f32 rings at S=32 are 16.8 MB alone); at
    # bf16 S=32 the rings are 8.4 MB — probe whether the fully-resident
    # fast path widens too (it holds the current 1.7M/s serving headline)
    from music_tpu.kernels.wavenet_decode import generate_tokens_fused

    params = wn.init_params(jax.random.PRNGKey(0), FULL)
    P = FULL.receptive_field + max(FULL.dilations)
    rows = []
    for S, G in [(16, 2), (32, 1), (32, 2)]:
        n_steps = 8192
        try:
            def run(seed):
                prime = jax.random.randint(
                    jax.random.PRNGKey(seed), (G * S, P), 0, 256)
                return np.asarray(generate_tokens_fused(
                    params, prime, cfg=FULL, n_steps=n_steps, n_streams=S,
                    n_stream_groups=G, dtype=jnp.bfloat16))
            nonce = int(time.time() * 1000) % 2**30
            run(nonce)
            run(nonce + 1)
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                run(nonce + 2 + i)
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            r = {"S": S, "G": G, "streams": S * G,
                 "us_per_step": round(dt / n_steps * 1e6, 1),
                 "total_samples_per_sec": round(G * S * n_steps / dt, 0)}
        except Exception as e:
            r = {"S": S, "G": G, "streams": S * G,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"}
        rows.append(r)
        print(f"# resident {r}", file=sys.stderr)
    out["results"]["resident_full"] = rows
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--shapes", action="store_true",
                    help="stream-shape split sweep at fixed total streams")
    args = ap.parse_args()
    if args.shapes:
        shapes_main()
        return

    out = {"metric": "hbm_rings_ab", "results": {}}
    plans = (
        [("scaled", SCALED, [1, 4])] if args.quick
        else [("scaled", SCALED, [1, 2, 4, 6]), ("full", FULL, [2, 8])]
    )
    for name, cfg, gs in plans:
        params = wn.init_params(jax.random.PRNGKey(0), cfg)
        rows = []
        for G in gs:
            # interleave arms: old, new, so relay drift hits both equally
            for batched in (False, True):
                r = bench(cfg, params, G, batched)
                rows.append(r)
                print(f"# {name} {r}", file=sys.stderr)
        out["results"][name] = rows
        # marginal cost per group for the largest-G pair
        for batched in (False, True):
            sel = [r for r in rows if r["batched"] == batched]
            if len(sel) >= 2:
                a, b = sel[0], sel[-1]
                marg = (b["us_per_step"] - a["us_per_step"]) / (b["G"] - a["G"])
                out["results"][f"{name}_marginal_us_per_group_batched{int(batched)}"] = round(marg, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
