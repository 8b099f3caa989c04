"""Quick hardware gate: the per-stream-clock HBM AE kernel must COMPILE
and run on a real chip (round 4's two-buffer redesign; the round-3
per-stream-row-DMA design was rejected by Mosaic with a sublane-alignment
error).  Checks, on the full-size AE at G=2 (16 streams):

  1. per-stream pos_offset = zeros  ==  scalar pos_offset 0   (bitwise)
  2. heterogeneous per-stream offsets compile + run (merge path live),
     and each stream matches a SHARED-clock run at that stream's offset
     (all 16 rows given the same clock -> row s must agree).

Run: python -m benchmarks._hw_perstream_compile_check
"""

from __future__ import annotations

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
    G, S = 2, 8
    B = G * S
    P = cfg.receptive_field + max(cfg.dilations)
    n_steps = 128
    pool = cfg.en_pool_kernel_size
    F = (P + n_steps + 3 * pool) // pool + 2

    rng = np.random.default_rng(0)
    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    enc = jnp.asarray(
        rng.standard_normal((B, F, cfg.en_bottleneck_width)), jnp.float32
    )
    prime = jnp.asarray(rng.integers(0, cfg.quantization_channel, (B, P)), jnp.int32)

    def run(pos):
        t0 = time.time()
        out = np.asarray(
            generate_tokens_fused_hbm(
                params, enc, prime, cfg=cfg, n_steps=n_steps,
                n_stream_groups=G, pos_offset=pos,
            )
        )
        return out, time.time() - t0

    # 1. zeros vector == scalar 0
    base, t_scalar = run(0)
    vec0, t_vec = run(jnp.zeros(B, jnp.int32))
    ok0 = bool(np.array_equal(base, vec0))
    print(f"# scalar {t_scalar:.1f}s, per-stream-zeros {t_vec:.1f}s, "
          f"bitwise_equal={ok0}", file=sys.stderr)

    # 2. heterogeneous offsets: row s of the per-stream run must equal
    # row s of a shared-clock run at that offset
    offs = np.array([(7 * i) % (3 * pool) for i in range(B)], np.int32)
    het, t_het = run(jnp.asarray(offs))
    agree = []
    for off in sorted(set(offs.tolist())):
        ref, _ = run(int(off))
        rows = np.nonzero(offs == off)[0]
        agree.append(bool(np.array_equal(het[rows], ref[rows])))
    ok1 = all(agree)
    print(f"# heterogeneous {t_het:.1f}s, per-offset agreement "
          f"{sum(agree)}/{len(agree)}", file=sys.stderr)

    import json
    print(json.dumps({
        "metric": "ae_hbm_perstream_hw_compile",
        "ok": bool(ok0 and ok1),
        "zeros_vs_scalar_bitwise": ok0,
        "heterogeneous_vs_shared": ok1,
        "streams": B,
    }))
    return 0 if (ok0 and ok1) else 1


if __name__ == "__main__":
    sys.exit(main())
