"""Same-process A/B of training-step GEMM-width variants (STATUS round-3
candidate #4 / VERDICT r2 action #3).

Training MFU is lane-width-bound: the hot GEMMs contract over the 32/64-wide
channel dims against the 128-lane MXU.  The verdict named "batch the four
equal-dilation fg GEMMs into one [B*T, Cr] x [Cr, 8*Cd] GEMM" — that literal
transform is NOT computable in training: the four equal-dilation layers (i,
i+10, i+20, i+30 in the 4x(1..512) stack) are sequentially dependent through
the residual stream (layer i+10's input contains layer i's output), unlike
decode where the ring-cache TAP side is known in advance.  The computable
wider-GEMM transforms are:

  - ``tapfuse``: the fw=2 dilated conv as ONE GEMM — gather the two taps
    side-by-side [B, T', 2*Cr] and contract with the reshaped [2*Cr, 2*Cd]
    weight, doubling the MXU contraction depth (32 -> 64 on the full model).
  - ``dsfuse``: dense+skip share input z [B, T, Cd]; fuse their weights to
    one [Cd, Cr+Cs] GEMM (the 32-column dense output stops wasting 96/128
    output lanes).

Both are exact reassociations (loss parity asserted below).  Run:
    python -m benchmarks.train_gemm_ab [--quick]
Prints one JSON line per (model, variant) plus a summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from music_tpu.models import wavenet as wn
from music_tpu.ops.conv import conv1x1, token_causal_conv

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


def loss_fn(params, tokens, cfg, wl, *, tapfuse, dsfuse, stack=False,
            skip_block=0, dtype=jnp.bfloat16):
    """Teacher-forced NLL over the window tail — the train-step hot math
    (mirrors train/wavenet_train._sharded_loss, single-shard form).

    ``skip_block=K``: stacked [B·T, K·Cd] x [K·Cd, Cs] skip GEMMs per
    K-layer block — VERDICT r4 #7's layer-blocked middle ground between
    the per-layer baseline and the rejected full ``stack`` (K=L must
    materialize the whole [B·T, L·Cd] concat; K=4 is one full-depth
    128-contraction GEMM whose concat can stay fused)."""
    inputs, targets = tokens[:, :-1], tokens[:, cfg.receptive_field:]
    p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    x = token_causal_conv(inputs, p["causal"])
    Cd = cfg.dilation_channels
    L = len(cfg.dilations)
    K = L if stack else max(skip_block, 0)
    skip_total = None
    zs = []
    for i, d in enumerate(cfg.dilations):
        w = p["fg"][i]  # [2, Cr, 2Cd]
        out_t = x.shape[1] - d
        if tapfuse:
            xcat = jnp.concatenate([x[:, :out_t], x[:, d:]], axis=-1)
            wcat = w.reshape(2 * w.shape[1], w.shape[2])
            fg = jnp.einsum("btc,cd->btd", xcat, wcat)
        else:
            fg = jnp.einsum("btc,cd->btd", x[:, :out_t], w[0]) + jnp.einsum(
                "btc,cd->btd", x[:, d:], w[1]
            )
        z = jnp.tanh(fg[..., :Cd]) * jax.nn.sigmoid(fg[..., Cd:])
        if dsfuse:
            wds = jnp.concatenate([p["dense"][i], p["skip"][i]], axis=-1)
            ds = conv1x1(z, wds)
            dense, skip = ds[..., : cfg.residual_channels], ds[..., cfg.residual_channels:]
            skip = skip[:, -wl:, :]
        elif K > 1:
            dense = conv1x1(z, p["dense"][i])
            zs.append(z[:, -wl:, :])
            skip = None
            if len(zs) == K or i + 1 == L:
                k0 = i + 1 - len(zs)
                z_blk = jnp.concatenate(zs, axis=-1)
                blk = conv1x1(
                    z_blk, p["skip"][k0 : i + 1].reshape(len(zs) * Cd, -1))
                skip_total = blk if skip_total is None else skip_total + blk
                zs = []
        else:
            dense = conv1x1(z, p["dense"][i])
            skip = conv1x1(z[:, -wl:, :], p["skip"][i])
        x = dense + x[:, -dense.shape[1]:, :]
        if skip is not None:
            skip_total = skip if skip_total is None else skip_total + skip
    h = jax.nn.relu(skip_total)
    h = jax.nn.relu(conv1x1(h, p["post1"]))
    logits = conv1x1(h, p["post2"])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))


def fwd_matmul_flops(cfg, B, wl):
    L, Cr, Cd, Cs, Q = (
        cfg.n_blocks, cfg.residual_channels, cfg.dilation_channels,
        cfg.skip_channels, cfg.quantization_channels,
    )
    # per layer over ~full window: fg (2 taps) + dense; skip over wl only
    T = cfg.receptive_field + wl
    f = L * (2 * T * 2 * Cr * 2 * Cd + 2 * T * Cd * Cr) * B
    f += L * 2 * wl * Cd * Cs * B
    f += (2 * wl * Cs * Cs + 2 * wl * Cs * Q) * B
    return float(f)


def bench_variant(cfg, B, wl, tapfuse, dsfuse, stack=False, skip_block=0,
                  n_fused=8, n_iters=5, seed0=0):
    params = wn.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    def one_step(carry, tokens):
        params, opt = carry
        loss, grads = jax.value_and_grad(loss_fn)(
            params, tokens, cfg, wl, tapfuse=tapfuse, dsfuse=dsfuse,
            stack=stack, skip_block=skip_block,
        )
        updates, opt = tx.update(grads, opt)
        return (optax.apply_updates(params, updates), opt), loss

    @jax.jit
    def k_steps(params, opt, batches):
        (params, opt), losses = jax.lax.scan(one_step, (params, opt), batches)
        return params, opt, losses

    def batches(seed):
        return jnp.asarray(
            np.random.default_rng(seed).integers(
                0, cfg.quantization_channels,
                (n_fused, B, cfg.receptive_field + wl), dtype=np.int32,
            )
        )

    nonce = int(time.time() * 1000) % 2**30
    params, opt, losses = k_steps(params, opt, batches(nonce))
    l0 = float(np.asarray(losses)[0])
    params, opt, _ = k_steps(params, opt, batches(nonce + 1))  # 2nd-call cost
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        params, opt, losses = k_steps(params, opt, batches(nonce + 2 + i))
        np.asarray(losses)  # host fetch inside the timed region
        times.append((time.perf_counter() - t0) / n_fused)
    dt = float(np.median(times))
    flops = 3.0 * fwd_matmul_flops(cfg, B, wl)  # fwd + ~2x bwd
    return {
        "variant": f"tapfuse={int(tapfuse)},dsfuse={int(dsfuse)},"
                   f"stack={int(stack)},blk={skip_block}",
        "step_ms": round(dt * 1e3, 2),
        "samples_per_sec": round(B * wl / dt, 1),
        "tflops": round(flops / dt / 1e12, 1),
        "first_loss": round(l0, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="full model only, fewer iters")
    args = ap.parse_args()

    B, wl = 4, 8192
    results = {}
    models = [("full", FULL)] if args.quick else [("full", FULL), ("scaled", SCALED)]
    for name, cfg in models:
        rows = []
        for tapfuse, dsfuse, stack, blk in [
            (0, 0, 0, 0), (1, 0, 0, 0), (1, 0, 1, 0),
            # VERDICT r4 #7: layer-blocked skip accumulation (K-layer
            # stacked GEMMs; K=4 -> 128-deep contraction, VMEM-size concat)
            (1, 0, 0, 4), (1, 0, 0, 8), (0, 0, 0, 4),
        ]:
            r = bench_variant(cfg, B, wl, bool(tapfuse), bool(dsfuse),
                              stack=bool(stack), skip_block=blk,
                              n_iters=3 if args.quick else 5)
            rows.append(r)
            print(f"# {name} {r}", file=sys.stderr)
        losses = [r["first_loss"] for r in rows]
        assert max(losses) - min(losses) < 0.05, f"variant losses diverge: {losses}"
        results[name] = rows
    best = {
        name: min(rows, key=lambda r: r["step_ms"])["variant"]
        for name, rows in results.items()
    }
    print(json.dumps({"metric": "train_gemm_ab", "results": results, "best": best}))


if __name__ == "__main__":
    main()
