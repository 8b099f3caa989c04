"""AE stream-shape hardware A/B (round 5): does the wide-tile lever that
doubled WaveNet HBM-rings serving extend to the conditioned AE kernel?

Measures the reference-size AE (12 MB f32) decode through
wavenet_ae_decode_hbm at fixed total streams with different (S, G)
splits, rings on, bf16 — plus interpret-proven exactness is assumed
(tests); this is the TIMING question only.  Compile rejections are
recorded per shape.

Run: python -m benchmarks._hw_ae_shapes_check
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from music_tpu.generate.wavenet_ae_generate import frame_window_width
    from music_tpu.kernels.wavenet_ae_decode_hbm import generate_tokens_fused_hbm
    from music_tpu.models import wavenet_ae as ae

    cfg = ae.WaveNetAEConfig()
    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    P = cfg.receptive_field + max(cfg.dilations)
    ks = 4096
    F = frame_window_width(P, ks, cfg.en_pool_kernel_size)

    rows = []
    for S, G in [(16, 2), (32, 1), (16, 4), (32, 2), (64, 1),
                 (16, 8), (64, 2), (128, 1)]:
        B = S * G
        try:
            def run(seed):
                key = jax.random.PRNGKey(seed)
                enc = 0.3 * jax.random.normal(
                    key, (B, F, cfg.en_bottleneck_width), jnp.float32)
                prime = jax.random.randint(
                    key, (B, P), 0, cfg.quantization_channel)
                return np.asarray(generate_tokens_fused_hbm(
                    params, enc, prime, cfg=cfg, n_steps=ks,
                    n_streams=S, n_stream_groups=G, dtype=jnp.bfloat16,
                    rings_in_hbm=True,
                    pos_offset=jnp.zeros(B, jnp.int32),
                ))

            nonce = int(time.time() * 1000) % 2**30
            run(nonce)
            run(nonce + 1)
            dts = []
            for i in (2, 3, 4):
                t0 = time.perf_counter()
                run(nonce + i)
                dts.append(time.perf_counter() - t0)
            dt = float(np.median(dts))
            r = {"S": S, "G": G, "streams": B,
                 "us_per_step": round(dt / ks * 1e6, 1),
                 "total_samples_per_sec": round(B * ks / dt, 0)}
        except Exception as e:
            r = {"S": S, "G": G, "streams": B,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"}
        rows.append(r)
        print(f"# {r}", file=sys.stderr)
    print(json.dumps({"metric": "ae_hbm_shapes_ab", "results": rows}))


if __name__ == "__main__":
    main()
