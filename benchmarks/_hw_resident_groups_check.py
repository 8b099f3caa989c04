"""Quick hardware gate: the resident conditioned AE kernel with
interleaved stream groups (round 4) must COMPILE and run on a real chip
— the G>1 port also restructured the G=1 program (DMA-booted ring init
from an ANY input instead of a VMEM input).  Checks, on a sub-10 MB AE:

  1. G=1 with the new boot path runs;
  2. G=2 (16 streams) == two G=1 runs, bitwise, with heterogeneous
     per-stream clocks spanning both groups.

Run: python -m benchmarks._hw_resident_groups_check
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from music_tpu.kernels.wavenet_ae_decode import (
        generate_tokens_fused,
        max_stream_groups,
    )
    from music_tpu.models import wavenet_ae as ae

    cfg = ae.WaveNetAEConfig(
        en_bottleneck_width=128,
        en_pool_kernel_size=128,
        de_skip_channel=256,
    )
    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    wb = sum(int(np.prod(v.shape)) * 4
             for v in jax.tree_util.tree_leaves(params)) / 1e6
    P = cfg.receptive_field + max(cfg.dilations)
    n_steps = 256
    pool = cfg.en_pool_kernel_size
    F = (P + n_steps + 3 * pool) // pool + 2
    res_g = max_stream_groups(cfg, jnp.float32, n_steps=n_steps, n_frames=F)
    print(f"# weights {wb:.1f} MB, res_g cap {res_g}", file=sys.stderr)

    rng = np.random.default_rng(0)
    B = 16
    enc = jnp.asarray(
        rng.standard_normal((B, F, cfg.en_bottleneck_width)) * 0.3, jnp.float32
    )
    prime = jnp.asarray(rng.integers(0, cfg.quantization_channel, (B, P)), jnp.int32)
    offs = jnp.asarray([(13 * i) % (2 * pool) for i in range(B)], jnp.int32)

    t0 = time.time()
    g2 = np.asarray(generate_tokens_fused(
        params, enc, prime, cfg=cfg, n_steps=n_steps,
        pos_offset=offs, n_stream_groups=2,
    ))
    t_g2 = time.time() - t0
    agree = []
    for lo in (0, 8):
        t0 = time.time()
        g1 = np.asarray(generate_tokens_fused(
            params, enc[lo:lo + 8], prime[lo:lo + 8], cfg=cfg,
            n_steps=n_steps, pos_offset=offs[lo:lo + 8],
        ))
        agree.append(bool(np.array_equal(g2[lo:lo + 8], g1)))
        print(f"# G=1 rows {lo}:{lo+8} {time.time()-t0:.1f}s "
              f"bitwise={agree[-1]}", file=sys.stderr)
    ok = all(agree)
    print(json.dumps({
        "metric": "ae_resident_groups_hw_compile",
        "ok": ok,
        "g2_vs_g1_bitwise": agree,
        "weights_mb": round(wb, 1),
        "res_g_cap": int(res_g),
        "g2_wall_s": round(t_g2, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
