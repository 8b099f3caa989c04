"""TPU distributional validation of fused-kernel categorical sampling.

The Pallas decode kernels sample via Gumbel-max over the on-chip PRNG
(``pltpu.prng_random_bits``), which has no interpret-mode lowering — so
the CPU suite can only shape-check it.  This script runs on real TPU and
compares the empirical token distribution of each fused mode against the
``lax.scan`` reference decoder's ``jax.random.categorical`` sampling
(PRNG streams differ; the distributions must match).

Modes: resident f32x8, resident bf16x16 (round-2 addition), HBM-streaming
f32x8, HBM-streaming bf16x16.  Pass criterion: total-variation distance
between token histograms <= 0.04 with ~131k samples per side (TV between
two independent empirical draws of these sizes concentrates well below
that when the underlying distributions are equal).

Run: python -m benchmarks.categorical_validation
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.models import wavenet as wn

CFG = wn.WaveNetConfig(
    filter_width=2,
    dilations=(1, 2, 4, 8, 1, 2, 4, 8),
    dilation_channels=64,
    residual_channels=64,
    skip_channels=128,
    quantization_channels=256,
    use_bias=False,
)
TEMPERATURE = 1.0
N_STEPS = 16384
TV_THRESHOLD = 0.04


def _hist(tokens: np.ndarray, q: int) -> np.ndarray:
    h = np.bincount(tokens.reshape(-1), minlength=q).astype(np.float64)
    return h / h.sum()


def main() -> int:
    if jax.default_backend() != "tpu":
        print("SKIP: requires a TPU backend (on-chip PRNG has no CPU lowering)")
        return 0

    from music_tpu.kernels.wavenet_decode import generate_tokens_fused
    from music_tpu.kernels.wavenet_decode_hbm import generate_tokens_fused_hbm

    params = wn.init_params(jax.random.PRNGKey(0), CFG)
    P = CFG.receptive_field + max(CFG.dilations)
    prime = jax.random.randint(jax.random.PRNGKey(1), (8, P), 0, 256)
    prime16 = jnp.concatenate([prime, prime], axis=0)

    # reference: scan decoder with jax.random categorical
    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(42), cfg=CFG, n_steps=N_STEPS,
        prime_len=P, sample_mode="categorical", temperature=TEMPERATURE,
    )
    ref_hist = _hist(np.asarray(ref), CFG.quantization_channels)

    modes = [
        ("resident f32x8", generate_tokens_fused, prime, 8, jnp.float32),
        ("resident bf16x16", generate_tokens_fused, prime16, 16, jnp.bfloat16),
        ("hbm f32x8", generate_tokens_fused_hbm, prime, 8, jnp.float32),
        ("hbm bf16x16", generate_tokens_fused_hbm, prime16, 16, jnp.bfloat16),
    ]
    ok = True
    for name, fn, pr, streams, dtype in modes:
        out = np.asarray(
            fn(
                params, pr, cfg=CFG, n_steps=N_STEPS, n_streams=streams,
                dtype=dtype, sample_mode="categorical",
                temperature=TEMPERATURE, seed=7,
            )
        )
        h = _hist(out, CFG.quantization_channels)
        tv = 0.5 * np.abs(h - ref_hist).sum()
        status = "ok" if tv <= TV_THRESHOLD else "FAIL"
        if tv > TV_THRESHOLD:
            ok = False
        print(f"categorical[{name}]: TV={tv:.4f} vs scan reference -> {status}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
