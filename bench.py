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


def bench_wavenet_generate(n_steps: int = 16_000, warmup_steps: int = 2_000) -> float:
    from music_tpu.models import wavenet as wn

    cfg = wn.WaveNetConfig()
    params = wn.init_params(jax.random.PRNGKey(0), cfg)
    prime = jnp.full((1, cfg.receptive_field), 128, jnp.int32)
    key = jax.random.PRNGKey(0)

    def run(n, seed):
        # vary the prime with the seed (a time-based nonce): identical
        # (input, executable) pairs can be served from an execution cache on
        # relayed backends, which would fake the timing — and the result must
        # be fetched to host inside the timed region, since block_until_ready
        # can return at dispatch-ack on tunneled platforms
        p = prime.at[0, 0].set(seed % 256)
        out = wn.generate_tokens(
            params, p, jax.random.PRNGKey(seed), cfg=cfg, n_steps=n,
            prime_len=cfg.receptive_field, sample_mode="argmax",
        )
        return np.asarray(out)

    nonce = int(time.time() * 1000)
    run(n_steps, nonce)  # compile + warm
    t0 = time.perf_counter()
    run(n_steps, nonce + 1)
    t1 = time.perf_counter()
    total = cfg.receptive_field - 1 + n_steps  # scan includes priming steps
    return total / (t1 - t0)


def main():
    rate = bench_wavenet_generate()
    print(
        json.dumps(
            {
                "metric": "wavenet_fast_generate_throughput",
                "value": round(rate, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(rate / TARGET_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
