"""Quick hardware gate: the int8 weight-streaming AE HBM kernel must
COMPILE and run on a real chip (round-4 addition of ``weight_dtype`` to
``wavenet_ae_decode_hbm`` — the scale multiplies are [1, C] sublane
broadcasts from VMEM inputs, legal per the WaveNet probes, but the AE
kernel adds the conditioning-bias add in between; this gate proves the
combination lowers).  Checks, on the full-size AE at G=2 (16 streams):

  1. int8 per-stream pos_offset = zeros  ==  int8 scalar pos_offset 0
     (bitwise — same numerics class, only the clock plumbing differs)
  2. int8 run on ``params`` vs f32 HBM run on ``dequantized_params``:
     token agreement reported (informational — float reassociation can
     flip argmax on an UNTRAINED model's tiny margins, so this number is
     NOT gated; the exactness proof is the interpret test suite).

Run: python -m benchmarks._hw_ae_int8_check
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
        dequantized_params,
        generate_tokens_fused_hbm,
    )
    from music_tpu.models import wavenet_ae as ae

    cfg = ae.WaveNetAEConfig()
    G, S = 2, 8
    B = G * S
    P = cfg.receptive_field + max(cfg.dilations)
    n_steps = 128
    pool = cfg.en_pool_kernel_size
    F = (P + n_steps + 3 * pool) // pool + 2

    rng = np.random.default_rng(0)
    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    dq = dequantized_params(params, cfg)
    enc = jnp.asarray(
        rng.standard_normal((B, F, cfg.en_bottleneck_width)), jnp.float32
    )
    prime = jnp.asarray(rng.integers(0, cfg.quantization_channel, (B, P)), jnp.int32)

    def run(p, pos, wdt):
        t0 = time.time()
        out = np.asarray(
            generate_tokens_fused_hbm(
                p, enc, prime, cfg=cfg, n_steps=n_steps,
                n_stream_groups=G, pos_offset=pos, weight_dtype=wdt,
            )
        )
        return out, time.time() - t0

    # 1. int8 scalar clock == int8 per-stream zero clocks (bitwise)
    i8_scalar, t_s = run(params, 0, jnp.int8)
    i8_vec, t_v = run(params, jnp.zeros(B, jnp.int32), jnp.int8)
    ok0 = bool(np.array_equal(i8_scalar, i8_vec))
    print(f"# int8 scalar {t_s:.1f}s, per-stream-zeros {t_v:.1f}s, "
          f"bitwise_equal={ok0}", file=sys.stderr)

    # 2. informational: int8(params) vs f32(dequantized params)
    f32_dq, t_f = run(dq, 0, None)
    agree = float((i8_scalar == f32_dq).mean())
    print(f"# f32-on-dq {t_f:.1f}s, token agreement {agree:.4f} "
          f"(untrained-margin noise expected; not gated)", file=sys.stderr)

    print(json.dumps({
        "metric": "ae_hbm_int8_hw_compile",
        "ok": ok0,
        "zeros_vs_scalar_bitwise": ok0,
        "int8_vs_f32dq_agreement": agree,
        "streams": B,
    }))
    return 0 if ok0 else 1


if __name__ == "__main__":
    sys.exit(main())
