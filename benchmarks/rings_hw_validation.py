"""HARDWARE exactness check for the HBM ring-state DMA schemes.

Interpret-mode tests prove the ring arithmetic, but interpret DMAs are
synchronous — a real DMA-ordering race (the class of bug the
``hbm_ring_min_dilation >= 3`` guard exists for) can only show up on
hardware.  This script trains the full-size WaveNet to confident argmax
margins (so cross-kernel float-accumulation differences cannot flip
tokens — docs/DIVERGENCES.md "Fused decode vs scan"), then decodes the
same primes through every ring scheme and demands 100% token agreement:

  - resident kernel (reference)         vs HBM-streaming (VMEM rings)
  - HBM rings, batched [G,S,W] DMAs     (the round-3 default)
  - HBM rings, per-(group,sg) DMAs      (the round-2 scheme)

at G=2 serving groups, f32x8 and bf16x16.  Run:
    python -m benchmarks.rings_hw_validation
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def main():
    t0 = time.time()
    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.kernels.wavenet_decode import generate_tokens_fused
    from music_tpu.kernels.wavenet_decode_hbm import generate_tokens_fused_hbm
    from music_tpu.models import wavenet as wn
    from music_tpu.parallel.mesh import MeshSpec, make_mesh
    from music_tpu.train import wavenet_train as wt

    cfg = wn.WaveNetConfig()
    sr = 16000
    t = np.arange(sr * 25) / sr
    codes = mu_law_encode_np((0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 256)

    mesh = make_mesh(MeshSpec(data=1, seq=1, model=1))
    tx = optax.adam(1e-3)
    state = wt.init_state(jax.random.PRNGKey(0), cfg, tx, mesh)
    WL, B = 12_288, 8
    step_fn, _ = wt.make_train_step(cfg, tx, mesh, WL, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    n_windows = (len(codes) - cfg.receptive_field) // WL
    for i in range(300):
        starts = rng.integers(0, max(n_windows * WL - WL - cfg.receptive_field, 1), B)
        batch = jnp.asarray(
            np.stack([codes[s : s + cfg.receptive_field + WL] for s in starts])
        )
        state, loss = step_fn(state, batch)
    params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), state.params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    print(f"# trained to loss {float(loss):.4f}", file=sys.stderr)

    P = cfg.receptive_field + max(cfg.dilations)
    n_steps = 4096
    out = {"metric": "rings_hw_validation", "train_loss": round(float(loss), 4)}
    ok = True
    for S, dtype, tag in [(8, jnp.float32, "f32x8"), (16, jnp.bfloat16, "bf16x16")]:
        G = 2
        prime = jnp.asarray(
            np.stack([codes[i * 64 : i * 64 + P] for i in range(G * S)]), jnp.int32
        )
        ref = np.asarray(generate_tokens_fused(
            params, prime, cfg=cfg, n_steps=n_steps, n_streams=S,
            n_stream_groups=G, dtype=dtype,
        ))
        modes = {
            "hbm_vmem_rings": functools.partial(generate_tokens_fused_hbm),
            "hbm_rings_batched": functools.partial(
                generate_tokens_fused_hbm, rings_in_hbm=True, batched_ring_dma=True
            ),
            "hbm_rings_per_sg": functools.partial(
                generate_tokens_fused_hbm, rings_in_hbm=True, batched_ring_dma=False
            ),
        }
        for name, fn in modes.items():
            got = np.asarray(fn(
                params, prime, cfg=cfg, n_steps=n_steps, n_streams=S,
                n_stream_groups=G, dtype=dtype,
            ))
            agree = float((got == ref).mean())
            out[f"{tag}_{name}_agreement"] = round(agree, 6)
            ok = ok and agree == 1.0
            print(f"# {tag} {name}: agreement {agree:.6f}", file=sys.stderr)
    out["all_exact"] = bool(ok)
    out["wall_s"] = round(time.time() - t0, 1)
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
