"""Hardware validation: DecodeSession continuous batching on a real chip.

Drives the persistent serving session (generate/serving.py) through an
admission churn scenario — streams join and leave between steps while the
fixed-capacity kernel keeps launching — and measures the steady-state
step wall (ONE jitted dispatch per step after warmup).  The exactness of
join/leave hand-offs is interpret-tested (tests/test_serving_session.py);
this script proves the plan compiles once and sustains serving throughput
on hardware.

Run: python -m benchmarks.session_serving_validation [--capacity 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=32)
    ap.add_argument("--steps-per-call", type=int, default=8192)
    ap.add_argument("--timed-steps", type=int, default=4)
    args = ap.parse_args()

    from music_tpu.generate.serving import DecodeSession
    from music_tpu.models import wavenet as wn

    t0 = time.time()
    cfg = wn.WaveNetConfig()
    params = wn.init_params(jax.random.PRNGKey(0), cfg)
    sess = DecodeSession(
        cfg, params, capacity=args.capacity, dtype=jnp.bfloat16,
        sample_mode="categorical", steps_per_call=args.steps_per_call,
    )
    out = {
        "metric": "session_serving_validation",
        "capacity": sess.capacity,
        "steps_per_call": args.steps_per_call,
        "fused": sess._fused is not None,
    }

    # admission churn: half-full -> full -> churned
    half = [sess.add() for _ in range(sess.capacity // 2)]
    r1 = sess.step()                       # compile + half occupancy
    rest = [sess.add() for _ in range(sess.capacity - len(half))]
    r2 = sess.step()                       # full occupancy, same executable
    for sid in half[::2]:
        sess.finish(sid)
    churn = [sess.add() for _ in range(len(half[::2]))]
    r3 = sess.step()
    alive = all(
        len(np.unique(r[sid][2048:])) > 4
        for r in (r1, r2, r3) for sid in r
    )
    out["streams_alive"] = bool(alive)
    out["served_stream_ids"] = len(set(r1) | set(r2) | set(r3))

    # steady state: timed full-occupancy steps (fresh PRNG per call is the
    # session's own seed advance — no relay result-cache hit; np.asarray
    # fetch is inside step())
    t1 = time.time()
    for _ in range(args.timed_steps):
        sess.step()
    wall = time.time() - t1
    total = args.timed_steps * args.steps_per_call * sess.capacity
    out.update({
        "steady_wall_s": round(wall, 2),
        "steady_samples_per_sec": round(total / wall, 0),
        "ok": bool(alive and len(set(r2)) == sess.capacity),
        "wall_total_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    })
    print(json.dumps(out))
    print(f"# {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
