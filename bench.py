"""Benchmark harness — run on real TPU hardware by the driver.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (BASELINE.json north star): WaveNet fast-generate
autoregressive decode throughput, single stream, full-size model
(40 blocks, receptive field 4094) — target >= 10,000 samples/sec/chip.
``vs_baseline`` is value / 10_000 (the driver-supplied target; the PyTorch
reference itself runs ~10-100 samples/sec of Python-stepped decode).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SAMPLES_PER_SEC = 10_000.0


def bench_wavenet_generate(n_steps: int = 16_384) -> tuple[float, float]:
    """Returns (single_stream_rate, total_rate) via the fused Pallas kernel
    (music_tpu/kernels/wavenet_decode.py): the whole autoregressive loop in
    one on-chip kernel, 8 independent streams in the sublane dimension."""
    from music_tpu.models import wavenet as wn
    from music_tpu.kernels.wavenet_decode import N_STREAMS, generate_tokens_fused

    cfg = wn.WaveNetConfig()
    params = wn.init_params(jax.random.PRNGKey(0), cfg)
    P = cfg.receptive_field + max(cfg.dilations)

    def run(seed):
        # vary the prime with a time-based nonce: identical (input,
        # executable) pairs can be served from an execution cache on relayed
        # backends — and the result must be fetched to host inside the timed
        # region, since block_until_ready can return at dispatch-ack
        prime = jax.random.randint(jax.random.PRNGKey(seed), (N_STREAMS, P), 0, 256)
        out = generate_tokens_fused(params, prime, cfg=cfg, n_steps=n_steps)
        return np.asarray(out)

    nonce = int(time.time() * 1000) % 2**31
    run(nonce)  # compile + warm
    t0 = time.perf_counter()
    run(nonce + 1)
    t1 = time.perf_counter()
    dt = t1 - t0
    return n_steps / dt, n_steps * N_STREAMS / dt


def main():
    rate, total_rate = bench_wavenet_generate()
    print(
        f"# single-stream {rate:.0f} samples/s; 8-stream total {total_rate:.0f} samples/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "wavenet_fast_generate_throughput_single_stream",
                "value": round(rate, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(rate / TARGET_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
