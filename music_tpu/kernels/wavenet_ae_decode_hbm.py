"""HBM-streaming conditioned decode for the WaveNet autoencoder.

The scaled-model counterpart of :mod:`kernels.wavenet_ae_decode`: layer
weights AND the per-frame conditioning-bias tables stay in HBM and stream
through double-buffered VMEM scratch, following the pipeline of
:mod:`kernels.wavenet_decode_hbm` (gate/projection packs per layer, a
4-slot prefetch pipeline, post-matrix column blocks).  For long
generations the conditioning tables dominate (F frames x streams x L*2Cd
floats — tens of MB for 10 s of audio); they are laid out ``[F, S, C]``
so the refresh on a frame boundary (every ``pool`` samples) is a single
contiguous-row DMA into persistent scratch, amortized over the next
``pool`` decode steps.

The post stage adds the conditioning bias inside the blocked post1 matmul
(``relu(h @ post1_block + cond_post[:, block])``); everything else —
ring caches, one-hot tokens, MXU lane extraction, output tiling, and the
reference's swapped gate split — matches the resident AE kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_tpu.models.wavenet_ae import WaveNetAEConfig
from music_tpu.kernels.wavenet_ae_decode import (
    N_STREAMS,
    _collect_prime_state,
    _grouping,
    _round_up,
)
from music_tpu.kernels.wavenet_decode_hbm import _quantize_cols


def _row_lanes(cfg: WaveNetAEConfig) -> int:
    counts: dict[int, int] = {}
    for d in cfg.dilations:
        counts[d] = counts.get(d, 0) + 1
    return _round_up(max(counts.values()) * cfg.de_residual_channel, 128)


def _post_block(cfg: WaveNetAEConfig) -> int:
    return min(128, math.gcd(cfg.de_skip_channel, cfg.quantization_channel))


def _shared_buf_bytes(cfg: WaveNetAEConfig, itemsize: int) -> int:
    W = _row_lanes(cfg)
    Cr, Cd, Cs = (
        cfg.de_residual_channel, cfg.de_dilation_channel, cfg.de_skip_channel,
    )
    return (
        4 * (W + Cr) * _round_up(2 * Cd, 128)     # gate buffers
        + 4 * Cd * (_round_up(Cr, 128) + Cs)      # proj buffers
        + 2 * Cs * _post_block(cfg)               # post buffers
    ) * itemsize


def _per_group_cond_out_bytes(cfg: WaveNetAEConfig, itemsize: int,
                              n_steps: int, n_streams: int = N_STREAMS) -> int:
    S = n_streams
    Cd, Cs = cfg.de_dilation_channel, cfg.de_skip_channel
    # cur + nxt frame rows: per-stream-clock callers double-buffer the
    # conditioning staging (charged unconditionally — scalar callers get
    # a slightly conservative cap)
    cond = 2 * S * (cfg.n_blocks * 2 * Cd + Cs) * itemsize
    out = _round_up(n_steps, 128) * S * 4 if n_steps else 0
    return cond + out


def max_stream_groups(
    cfg: WaveNetAEConfig,
    dtype=jnp.float32,
    vmem_budget: int = 14 * 1024 * 1024,
    n_steps: int = 0,
    n_streams: int = N_STREAMS,
) -> int:
    """Serving groups (``n_streams`` each — 8 f32 / 16 bf16) that fit VMEM
    for the conditioned HBM-streaming kernel: per group one ring-cache set
    + the current-frame conditioning rows + the int32 token output tile
    (pass the per-CALL step count; chunk long decodes).  Mirrors
    kernels.wavenet_decode_hbm.max_stream_groups."""
    itemsize = jnp.dtype(dtype).itemsize
    W = _row_lanes(cfg)
    distinct = sorted({d for d in cfg.dilations})
    per_group = sum(distinct) * n_streams * W * itemsize
    per_group += _per_group_cond_out_bytes(cfg, itemsize, n_steps, n_streams)
    return max(0, (vmem_budget - _shared_buf_bytes(cfg, itemsize)) // per_group)


def max_stream_groups_hbm_rings(
    cfg: WaveNetAEConfig,
    dtype=jnp.float32,
    min_dilation: int = 32,
    vmem_budget: int = 12 * 1024 * 1024,
    n_steps: int = 0,
    n_streams: int = N_STREAMS,
) -> int:
    """Group cap with ``rings_in_hbm=True``: only the small-dilation rings,
    the per-HBM-group tap/write staging pairs, the conditioning rows and
    the output tile cost VMEM per group."""
    itemsize = jnp.dtype(dtype).itemsize
    W = _row_lanes(cfg)
    distinct = sorted({d for d in cfg.dilations})
    small = [d for d in distinct if d < min_dilation]
    n_hbm = len(distinct) - len(small)
    per_group = (sum(small) + 4 * n_hbm) * n_streams * W * itemsize
    per_group += _per_group_cond_out_bytes(cfg, itemsize, n_steps, n_streams)
    return max(
        0,
        (vmem_budget - _shared_buf_bytes(cfg, itemsize)) // max(per_group, 1),
    )


def serving_stream_width(cfg: WaveNetAEConfig, dtype=jnp.bfloat16) -> int:
    """Measured-optimal sublane tile height for conditioned HBM-RINGS
    serving (the AE port of the WaveNet round-5 stream-shape finding:
    wide tiles batch every per-layer matmul across streams instead of
    re-paying the layer chain per group).  The AE optimum sits LOWER
    than WaveNet's (S·W ≈ 8k lanes vs 16k — reference-size AE at 128
    streams: S16xG8 787k -> S64xG2 1.13-1.24M ≈ S128xG1 1.17-1.20M
    samples/s, while S32xG4 trails ~15%; artifact
    ae_hbm_shapes_ab_r5.json): the per-stream conditioning staging and
    frame-clock tables scale with S and push back sooner.  Returns a
    multiple of the native tile height (8 f32 / 16 bf16), capped at 64."""
    base = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
    W = max(_row_lanes(cfg), 128)
    return int(min(64, max(base, (8192 // W) // base * base)))


def _ae_kernel_hbm(
    # VMEM inputs
    cur0_ref,        # [G*S, Q]
    prev0_ref,       # [G*S, Q]
    ecur_ref,        # [Q, Cr]
    eprev_ref,       # [Q, Cr]
    # HBM (ANY) inputs
    ring_init_hbm,   # [G*sum(d_g), S, W]
    gate_hbm,        # [L, W + Cr, 2Cd]
    proj_hbm,        # [L, Cd, Crp + Cs]
    post_hbm,        # [Cs, Cs + Q]
    condfg_hbm,      # [F, G*S, L*2Cd]
    condpost_hbm,    # [F, G*S, Cs]
    *rest,           # ([gscale, pdscale, pkscale, postscale] when int8)
    #                  + off_ref (SMEM i32 — shared clock: [1] absolute time
    #                  of step 0 = pos_offset + P, dynamic so chunked long
    #                  decodes don't recompile; per-stream clocks: [G*S]
    #                  REBASED in-window phases r_s in [0, pool) — the
    #                  wrapper shifts each stream's table column by its base
    #                  frame, AEDecodeSession streams join at any time)
    #                  (+ off_lanes VMEM input when per-stream clocks)
    #                  + out_ref [(T//128)*G*S, 128] i32
    #                  (+ ring_state ANY output when hbm rings) + scratch
    cfg: WaveNetAEConfig,
    total: int,
    F: int,
    n_stream_groups: int,
    dtype,
    hbm_ring_min_dilation: int = 0,
    per_stream_pos: bool = False,
    n_streams: int = N_STREAMS,
    weight_dtype=None,
):
    hbm_rings = hbm_ring_min_dilation > 0
    quantized = weight_dtype is not None
    rest = list(rest)
    if quantized:
        gscale_ref = rest.pop(0)     # [L, 1, Cg]
        pdscale_ref = rest.pop(0)    # [L, 1, Cr]
        pkscale_ref = rest.pop(0)    # [L, 1, Cs]
        postscale_ref = rest.pop(0)  # [n_post, 1, PB]
    off_ref = rest.pop(0)
    # lane-replicated [G*S, 128] copy of off_ref so the crossing mask is
    # pure elementwise vector math (no sublane broadcasts)
    off_lanes_ref = rest.pop(0) if per_stream_pos else None
    out_ref = rest.pop(0)
    ring_state = rest.pop(0) if hbm_rings else None
    scratch = rest
    t0_frame_offset = off_ref[0]
    L = cfg.n_blocks
    Cr, Cd, Cs, Q = (
        cfg.de_residual_channel,
        cfg.de_dilation_channel,
        cfg.de_skip_channel,
        cfg.quantization_channel,
    )
    S = n_streams  # 8 (f32) / 16 (bf16): the native sublane tile heights
    G = n_stream_groups  # independent serving groups sharing the weight +
    # conditioning stream (see kernels/wavenet_decode_hbm.py)
    NB = 4
    Cg = _round_up(2 * Cd, 128)  # gate-pack minor dim, lane-aligned
    pool = cfg.en_pool_kernel_size
    W = _row_lanes(cfg)
    Crp = _round_up(Cr, 128)
    PB = _post_block(cfg)
    n_p1, n_p2 = Cs // PB, Q // PB
    n_post = n_p1 + n_p2
    groups, lane_of_layer = _grouping(cfg, W)
    n_groups = len(groups)
    # large-dilation ring slots optionally live in HBM with one-step-ahead
    # tap prefetch — same scheme as kernels/wavenet_decode_hbm.py
    is_hbm = [hbm_rings and d >= hbm_ring_min_dilation for d, _ in groups]
    vmem_idx = [g for g in range(n_groups) if not is_hbm[g]]
    hbm_idx = [g for g in range(n_groups) if is_hbm[g]]
    n_vmem, n_hbm = len(vmem_idx), len(hbm_idx)
    rings_list = scratch[:n_vmem]
    rings = {g: rings_list[k] for k, g in enumerate(vmem_idx)}
    tap_stage = {g: scratch[n_vmem + k] for k, g in enumerate(hbm_idx)}
    wr_stage = {g: scratch[n_vmem + n_hbm + k] for k, g in enumerate(hbm_idx)}
    tail = scratch[n_vmem + 2 * n_hbm:]
    if per_stream_pos:
        (gate_buf, proj_buf, post_buf, cond_fg_cur, cond_post_cur,
         cond_fg_nxt, cond_post_nxt,
         gate_sem, proj_sem, post_sem, cond_sem, *ring_sems) = tail
    else:
        (gate_buf, proj_buf, post_buf, cond_fg_cur, cond_post_cur,
         gate_sem, proj_sem, post_sem, cond_sem, *ring_sems) = tail
    if n_hbm:
        tap_sem, wr_sem = ring_sems
    layer_group = {}
    for g, (d, layers) in enumerate(groups):
        for i in layers:
            layer_group[i] = g
    ring_base = list(np.cumsum([0] + [d for d, _ in groups[:-1]]))

    def gate_dma(slot, i):
        return pltpu.make_async_copy(gate_hbm.at[i], gate_buf.at[slot], gate_sem.at[slot])

    def proj_dma(slot, i):
        return pltpu.make_async_copy(proj_hbm.at[i], proj_buf.at[slot], proj_sem.at[slot])

    def post_dma(slot, j):
        return pltpu.make_async_copy(
            post_hbm.at[:, pl.ds(j * PB, PB)], post_buf.at[slot], post_sem.at[slot]
        )

    S_total = G * S

    def refresh_cond(t):
        # contiguous-row DMA of the current frame's bias rows (layout
        # [F, S, C]); a stall here costs once per `pool` steps
        frame = jnp.minimum((t + t0_frame_offset) // pool, F - 1)
        fg_dma = pltpu.make_async_copy(
            condfg_hbm.at[frame], cond_fg_cur, cond_sem.at[0]
        )
        post_dma_c = pltpu.make_async_copy(
            condpost_hbm.at[frame], cond_post_cur, cond_sem.at[1]
        )
        fg_dma.start()
        post_dma_c.start()
        fg_dma.wait()
        post_dma_c.wait()

    # Per-stream utterance clocks, the Mosaic-aligned way (sublane-dim
    # row slices are illegal on tiled memrefs): the wrapper rebases every
    # stream's table column so its step-0 phase r_s = off_ref[s] lies in
    # [0, pool).  Then at any step t every stream's frame is w or w+1
    # with w = t // pool a SHARED window counter — the refresh stays
    # whole-tile leading-dim-indexed DMAs (frame w rows in ``cur``, w+1
    # in ``nxt``), and a stream crossing mid-window commits its rows via
    # a lane-replicated-mask vector select (no sublane addressing).
    def start_nxt(w_next):
        row = jnp.minimum(w_next, F - 1)
        fg = pltpu.make_async_copy(
            condfg_hbm.at[row], cond_fg_nxt, cond_sem.at[0, 1]
        )
        po = pltpu.make_async_copy(
            condpost_hbm.at[row], cond_post_nxt, cond_sem.at[1, 1]
        )
        fg.start()
        po.start()
        fg.wait()
        po.wait()

    def boot_streams():
        fg = pltpu.make_async_copy(condfg_hbm.at[0], cond_fg_cur, cond_sem.at[0, 0])
        po = pltpu.make_async_copy(condpost_hbm.at[0], cond_post_cur, cond_sem.at[1, 0])
        fg.start()
        po.start()
        fg.wait()
        po.wait()
        start_nxt(1)

    def merge_crossed(tm):
        # commit rows for every stream already past its in-window crossing
        # (idempotent w.r.t. the same ``nxt`` tile, so firing on any
        # crossing instant is exact for all previously-crossed rows too)
        crossed = (tm + off_lanes_ref[:]) >= pool  # [G*S, 128] bool
        for buf_cur, buf_nxt, width in (
            (cond_fg_cur, cond_fg_nxt, L * 2 * Cd),
            (cond_post_cur, cond_post_nxt, Cs),
        ):
            for c in range(0, width, 128):
                n = min(128, width - c)
                buf_cur[:, c : c + n] = jnp.where(
                    crossed[:, :n], buf_nxt[:, c : c + n], buf_cur[:, c : c + n]
                )

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (S, Q), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)

    # boot: ring caches from HBM, layer pipeline warm-up, first cond rows
    n_tiles = sum(d for d, _ in groups)
    ring_src = ring_state if hbm_rings else ring_init_hbm
    for sg in range(G):
        for g in vmem_idx:
            d = groups[g][0]
            init_dma = pltpu.make_async_copy(
                ring_src.at[pl.ds(sg * n_tiles + ring_base[g], d)],
                rings[g].at[pl.ds(sg * d, d)],
                gate_sem.at[0],
            )
            init_dma.start()
            init_dma.wait()

    S_ = S

    def hbm_base(g, sg):
        return sg * n_tiles + ring_base[g]

    def tap_dma(k, g, sg, slot, parity):
        return pltpu.make_async_copy(
            ring_state.at[hbm_base(g, sg) + slot],
            tap_stage[g].at[parity, pl.ds(sg * S_, S_)],
            tap_sem.at[k, parity, sg],
        )

    def wr_dma(k, g, sg, slot, parity):
        return pltpu.make_async_copy(
            wr_stage[g].at[parity, pl.ds(sg * S_, S_)],
            ring_state.at[hbm_base(g, sg) + slot],
            wr_sem.at[k, parity, sg],
        )

    for k, g in enumerate(hbm_idx):
        for sg in range(G):
            tap_dma(k, g, sg, 0, 0).start()
    for i0 in range(min(NB - 1, L)):
        gate_dma(i0 % NB, i0).start()
        proj_dma(i0 % NB, i0).start()
    if per_stream_pos:
        boot_streams()
    else:
        refresh_cond(0)

    def step(t, carry):
        prev_oh, cur_oh, out_row = carry  # tuples of G per-group arrays

        if per_stream_pos:
            tm = jax.lax.rem(t, pool)

            @pl.when(jnp.logical_and(t > 0, tm == 0))
            def _():
                # window boundary: every stream sits exactly at frame
                # w = t // pool here (r_s < pool), which is ``nxt``
                cond_fg_cur[...] = cond_fg_nxt[...]
                cond_post_cur[...] = cond_post_nxt[...]
                start_nxt(t // pool + 1)

            # exactly one crossing per stream per window, at
            # tm == pool - r_s (r_s == 0 crosses at the boundary above)
            merge_now = functools.reduce(
                jnp.logical_or,
                [
                    jnp.logical_and(off_ref[s] > 0, tm == pool - off_ref[s])
                    for s in range(S_total)
                ],
            )
            pl.when(merge_now)(lambda: merge_crossed(tm))
        else:
            @pl.when(jnp.logical_and(t > 0, (t + t0_frame_offset) % pool == 0))
            def _():
                refresh_cond(t)

        x = [
            (
                jnp.dot(cur_oh[sg], ecur_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(prev_oh[sg], eprev_ref[:], preferred_element_type=jnp.float32)
            ).astype(dtype)
            for sg in range(G)
        ]

        parity = jax.lax.rem(t, 2)
        nparity = jax.lax.rem(t + 1, 2)
        slots = []
        for g, (d, layers) in enumerate(groups):
            slots.append(t % d if d > 1 else 0)
        for k, g in enumerate(hbm_idx):
            for sg in range(G):
                tap_dma(k, g, sg, slots[g], parity).wait()
        taps = []
        for sg in range(G):
            row = []
            for g, (d, _) in enumerate(groups):
                if is_hbm[g]:
                    row.append(tap_stage[g][parity, pl.ds(sg * S, S)])
                else:
                    row.append(rings[g][pl.ds(sg * d + slots[g], 1)][0])
            taps.append(row)

        xs = [[] for _ in range(G)]
        skip_acc = [jnp.zeros((S, Cs), jnp.float32) for _ in range(G)]
        for i in range(L):
            slot = i % NB
            nxt = i + NB - 1
            if nxt < L:
                gate_dma(nxt % NB, nxt).start()
                proj_dma(nxt % NB, nxt).start()
            if i + 1 == L:
                post_dma(0, 0).start()
            gate_dma(slot, i).wait()
            proj_dma(slot, i).wait()

            if quantized:
                # int8 -> compute-dtype convert, once per DMA'd tile (shared
                # by all G groups; depends only on the DMA, so it schedules
                # off the activation chain); per-output-column scales apply
                # exactly AFTER the matmuls (linearity) and BEFORE the
                # conditioning bias — exact vs dequantized_params
                gw = gate_buf[slot].astype(dtype)   # [W+Cr, Cg]
                pw = proj_buf[slot].astype(dtype)   # [Cd, Crp+Cs]
                gs = gscale_ref[i]                  # [1, Cg]
                pds = pdscale_ref[i]                # [1, Cr]
                pks = pkscale_ref[i]                # [1, Cs]

            for sg in range(G):
                tap = taps[sg][layer_group[i]]
                xs[sg].append(x[sg])
                if quantized:
                    fg = jnp.dot(tap, gw[:W], preferred_element_type=jnp.float32)
                    fg = (fg + jnp.dot(x[sg], gw[W:], preferred_element_type=jnp.float32)) * gs
                    fg = fg[:, : 2 * Cd] + cond_fg_cur[pl.ds(sg * S, S), i * 2 * Cd : (i + 1) * 2 * Cd]
                    # reference gate split: gate first half, filter second
                    z = (jnp.tanh(fg[:, Cd:]) * jax.nn.sigmoid(fg[:, :Cd])).astype(dtype)
                    x[sg] = (
                        x[sg]
                        + jnp.dot(z, pw[:, :Cr], preferred_element_type=jnp.float32) * pds
                    ).astype(dtype)
                    skip_acc[sg] = skip_acc[sg] + jnp.dot(
                        z, pw[:, Crp:], preferred_element_type=jnp.float32
                    ) * pks
                    continue
                fg = jnp.dot(tap, gate_buf[slot, :W], preferred_element_type=jnp.float32)
                fg = fg + jnp.dot(x[sg], gate_buf[slot, W:], preferred_element_type=jnp.float32)
                fg = fg[:, : 2 * Cd] + cond_fg_cur[pl.ds(sg * S, S), i * 2 * Cd : (i + 1) * 2 * Cd]
                # reference gate split: gate first half, filter second
                z = (jnp.tanh(fg[:, Cd:]) * jax.nn.sigmoid(fg[:, :Cd])).astype(dtype)
                x[sg] = (x[sg] + jnp.dot(z, proj_buf[slot, :, :Cr], preferred_element_type=jnp.float32)).astype(dtype)
                skip_acc[sg] = skip_acc[sg] + jnp.dot(
                    z, proj_buf[slot, :, Crp:], preferred_element_type=jnp.float32
                )

        for g, (d, layers) in enumerate(groups):
            pad = W - len(layers) * Cr
            k = hbm_idx.index(g) if is_hbm[g] else -1
            for sg in range(G):
                pieces = [xs[sg][i] for i in layers]
                if pad:
                    pieces.append(jnp.zeros((S, pad), dtype))
                new_tile = jnp.concatenate(pieces, axis=1)
                if not is_hbm[g]:
                    rings[g][pl.ds(sg * d + slots[g], 1)] = new_tile[None]
                    continue
                @pl.when(t >= 2)
                def _(k=k, g=g, sg=sg, d=d):
                    wr_dma(k, g, sg, (t - 2) % d if d > 1 else 0, parity).wait()
                wr_stage[g][parity, pl.ds(sg * S, S)] = new_tile
                wr_dma(k, g, sg, slots[g], parity).start()

        @pl.when(t + 1 < total)
        def _():
            for k, g in enumerate(hbm_idx):
                d = groups[g][0]
                for sg in range(G):
                    tap_dma(k, g, sg, (t + 1) % d, nparity).start()

        # blocked post1 with the conditioning bias folded in, then post2
        h = [jax.nn.relu(skip_acc[sg]).astype(dtype) for sg in range(G)]
        h2_blocks = [[] for _ in range(G)]
        for j in range(n_p1):
            slot = j % 2
            if j + 1 < n_post:
                post_dma((j + 1) % 2, j + 1).start()
            post_dma(slot, j).wait()
            pb = post_buf[slot].astype(dtype) if quantized else post_buf[slot]
            for sg in range(G):
                blk = jnp.dot(h[sg], pb, preferred_element_type=jnp.float32)
                if quantized:
                    blk = blk * postscale_ref[j]
                blk = blk + cond_post_cur[pl.ds(sg * S, S), j * PB : (j + 1) * PB]
                h2_blocks[sg].append(jax.nn.relu(blk).astype(dtype))
        h2 = [jnp.concatenate(h2_blocks[sg], axis=1) for sg in range(G)]
        logit_blocks = [[] for _ in range(G)]
        for j2 in range(n_p2):
            j = n_p1 + j2
            slot = j % 2
            if j + 1 < n_post:
                post_dma((j + 1) % 2, j + 1).start()
            else:
                @pl.when(t + 1 < total)
                def _():
                    for i0 in range(min(NB - 1, L)):
                        gate_dma(i0 % NB, i0).start()
                        proj_dma(i0 % NB, i0).start()
            post_dma(slot, j).wait()
            pb = post_buf[slot].astype(dtype) if quantized else post_buf[slot]
            for sg in range(G):
                lj = jnp.dot(h2[sg], pb, preferred_element_type=jnp.float32)
                if quantized:
                    lj = lj * postscale_ref[j]
                logit_blocks[sg].append(lj)
        logits = [jnp.concatenate(logit_blocks[sg], axis=1) for sg in range(G)]

        next_tok = [
            jnp.argmax(logits[sg], axis=1, keepdims=True).astype(jnp.int32)
            for sg in range(G)
        ]
        next_oh = tuple((q_iota == next_tok[sg]).astype(dtype) for sg in range(G))
        out_row = tuple(
            jnp.where(lane_iota == (t % 128), next_tok[sg], out_row[sg])
            for sg in range(G)
        )

        @pl.when(t % 128 == 127)
        def _():
            for sg in range(G):
                base = pl.multiple_of((t // 128) * (G * S) + sg * S, 8)
                out_ref[pl.ds(base, S), :] = out_row[sg]

        return cur_oh, next_oh, out_row

    jax.lax.fori_loop(
        0, total, step,
        (
            tuple(prev0_ref[pl.ds(sg * S, S)] for sg in range(G)),
            tuple(cur0_ref[pl.ds(sg * S, S)] for sg in range(G)),
            tuple(jnp.zeros((S, 128), jnp.int32) for _ in range(G)),
        ),
    )
    for t_last in range(max(total - 2, 0), total):
        for k, g in enumerate(hbm_idx):
            d = groups[g][0]
            for sg in range(G):
                wr_dma(k, g, sg, t_last % d if d > 1 else 0, t_last % 2).wait()


def _build_hbm_weights(params: dict, cfg: WaveNetAEConfig, dtype,
                       weight_dtype=None):
    """Pack the decoder pytree into the three streamed HBM layouts.

    ``weight_dtype=jnp.int8`` stores the packs int8 with per-output-column
    f32 scales, exactly as kernels/wavenet_decode_hbm._build_hbm_weights
    does for the unconditioned kernel (scales stored pre-split/pre-blocked
    so every kernel-side multiply uses a whole [1, cols] row)."""
    L, Cr, Cd, Cs = (
        cfg.n_blocks,
        cfg.de_residual_channel,
        cfg.de_dilation_channel,
        cfg.de_skip_channel,
    )
    W = _row_lanes(cfg)
    Crp = _round_up(Cr, 128)
    _, lane_of_layer = _grouping(cfg, W)

    Cg = _round_up(2 * Cd, 128)  # minor dim lane-aligned for the sliced DMA
    gate = jnp.zeros((L, W + Cr, Cg), jnp.float32)
    for i in range(L):
        off = lane_of_layer[i]
        gate = gate.at[i, off : off + Cr, : 2 * Cd].set(params["fg"][i, 0])
        gate = gate.at[i, W : W + Cr, : 2 * Cd].set(params["fg"][i, 1])
    dense_p = jnp.zeros((L, Cd, Crp), jnp.float32).at[:, :, :Cr].set(params["dense"])
    proj = jnp.concatenate([dense_p, params["skip"]], axis=2)
    post = jnp.concatenate([params["conn1"], params["conn2"]], axis=1)
    out = {
        "ecur": params["de_causal"][1].astype(dtype),
        "eprev": params["de_causal"][0].astype(dtype),
    }
    if weight_dtype is None:
        out.update(
            gate=gate.astype(dtype), proj=proj.astype(dtype), post=post.astype(dtype)
        )
        return out
    if jnp.dtype(weight_dtype) != jnp.int8:
        raise NotImplementedError("weight_dtype must be None or jnp.int8")
    gate_q, gate_s = _quantize_cols(gate, axis=1)     # [L,1,Cg]
    proj_q, proj_s = _quantize_cols(proj, axis=1)     # [L,1,Crp+Cs]
    post_q, post_s = _quantize_cols(post, axis=0)     # [1,Cs+Q]
    PB = _post_block(cfg)
    n_post = (Cs + cfg.quantization_channel) // PB
    out.update(
        gate=gate_q, proj=proj_q, post=post_q,
        gate_scale=gate_s.astype(jnp.float32),                    # [L,1,Cg]
        proj_scale_dense=proj_s[:, :, :Cr].astype(jnp.float32),   # [L,1,Cr]
        proj_scale_skip=proj_s[:, :, Crp:].astype(jnp.float32),   # [L,1,Cs]
        post_scale_blocks=post_s[0]
        .reshape(n_post, 1, PB)
        .astype(jnp.float32),                                     # [n_post,1,PB]
        _proj_scale_full=proj_s.astype(jnp.float32),  # dequant helper only
    )
    return out


def dequantized_params(params: dict, cfg: WaveNetAEConfig) -> dict:
    """The params pytree the ``weight_dtype=jnp.int8`` kernel actually
    computes with: pack -> int8 quantize -> dequantize -> unpack.

    Only the streamed DECODER packs (fg/dense/skip/conn1/conn2) quantize;
    embeddings and the conditioning projections (cond_fg/cond_post — their
    bias rows stream in f32/compute dtype) pass through.  Running the scan
    decoder (models/wavenet_ae.generate_tokens) on this pytree is the
    exact reference for the quantized kernel."""
    L, Cr, Cd, Cs = (
        cfg.n_blocks,
        cfg.de_residual_channel,
        cfg.de_dilation_channel,
        cfg.de_skip_channel,
    )
    W = _row_lanes(cfg)
    _, lane_of_layer = _grouping(cfg, W)
    Crp = _round_up(Cr, 128)
    w = _build_hbm_weights(params, cfg, jnp.float32, weight_dtype=jnp.int8)
    gate = w["gate"].astype(jnp.float32) * w["gate_scale"]
    proj = w["proj"].astype(jnp.float32) * w["_proj_scale_full"]
    post = w["post"].astype(jnp.float32) * jnp.concatenate(
        [b for b in w["post_scale_blocks"]], axis=1
    )
    fg = jnp.stack(
        [
            jnp.stack(
                [
                    gate[i, lane_of_layer[i] : lane_of_layer[i] + Cr, : 2 * Cd],
                    gate[i, W : W + Cr, : 2 * Cd],
                ]
            )
            for i in range(L)
        ]
    )
    return dict(
        params,
        fg=fg,
        dense=proj[:, :, :Cr],
        skip=proj[:, :, Crp:],
        conn1=post[:, :Cs],
        conn2=post[:, Cs:],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "interpret", "dtype", "n_stream_groups",
        "rings_in_hbm", "hbm_ring_min_dilation", "n_streams", "weight_dtype",
    ),
)
def generate_tokens_fused_hbm(
    params: dict,
    encoding: jax.Array,
    prime: jax.Array,
    *,
    cfg: WaveNetAEConfig,
    n_steps: int,
    interpret: bool = False,
    n_stream_groups: int = 1,
    dtype=jnp.float32,
    weight_dtype=None,
    rings_in_hbm: bool = False,
    hbm_ring_min_dilation: int = 32,
    pos_offset=0,
    n_streams: int = N_STREAMS,
) -> jax.Array:
    """Conditioned decode with HBM-resident weights + conditioning tables —
    same contract as :func:`kernels.wavenet_ae_decode.generate_tokens_fused`
    but with no VMEM ceiling on model size or generation length.

    ``n_stream_groups=G`` serves ``G * n_streams`` independent utterances
    (``n_streams``: 8 f32 / 16 bf16 — the native sublane tile heights) from
    one kernel; the weight + conditioning stream is shared across groups (see
    kernels/wavenet_decode_hbm.py).  ``rings_in_hbm=True`` additionally
    moves the large-dilation ring slots to HBM state with one-step-ahead
    tap prefetch — the serving-group cap stops being VMEM-ring-bound
    (same scheme and exactness guarantees as the WaveNet HBM kernel).

    ``pos_offset`` may be a per-stream ``[B]`` vector — every stream keeps
    its OWN utterance clock (AEDecodeSession streams join at different
    times): each stream's table column is rebased host-side to its base
    frame, so in-kernel every stream's frame is ``w`` or ``w+1`` with a
    SHARED window counter ``w = t // pool`` — the refresh stays whole-tile
    leading-dim DMAs into a cur/nxt staging pair and per-stream crossings
    commit via a lane-replicated-mask vector select (Mosaic forbids
    sublane-dim row slices).  Scalar callers compile the shared-clock
    program unchanged (one contiguous block DMA per refresh).

    ``weight_dtype=jnp.int8`` streams int8 weight-only-quantized decoder
    packs (per-output-column scales, applied exactly post-matmul and
    before the conditioning bias) — 4x less weight HBM traffic than f32,
    2x less than bf16 on this bandwidth-bound kernel.  Conditioning-bias
    tables keep the compute dtype (they are per-stream activations, not
    weights).  Token-exact vs the scan decoder run on
    :func:`dequantized_params`; like the WaveNet int8 mode it ships for
    HBM *capacity* (the convert cancels the DMA saving on v5e —
    docs/BENCHMARKS.md "Int8 weight streaming")."""
    if cfg.filter_width != 2:
        raise NotImplementedError("fused decode assumes filter_width=2")
    if rings_in_hbm and hbm_ring_min_dilation < 3 and not interpret:
        # same race as kernels/wavenet_decode_hbm.py: the one-step-ahead tap
        # prefetch is only ordered after the slot's write when d >= 3
        # (interpret-mode DMAs are synchronous, so tests may go lower).
        raise NotImplementedError(
            "rings_in_hbm requires hbm_ring_min_dilation >= 3 on hardware: "
            "d<3 ring groups must stay in VMEM (tap prefetch races the "
            "previous step's ring write for d=1/2)"
        )
    B, P = prime.shape
    G = n_stream_groups
    S = n_streams
    S_total = G * S
    if B > S_total:
        raise ValueError(f"at most {S_total} streams, got {B}")
    pos_arr = jnp.asarray(pos_offset, jnp.int32)
    per_stream_pos = pos_arr.ndim > 0  # static at trace time
    pos_vec = jnp.broadcast_to(pos_arr.reshape(-1), (B,))
    if B < S_total:
        pad = S_total - B
        prime = jnp.concatenate([prime, jnp.tile(prime[-1:], (pad, 1))], axis=0)
        encoding = jnp.concatenate(
            [encoding, jnp.tile(encoding[-1:], (pad, 1, 1))], axis=0
        )
        pos_vec = jnp.concatenate([pos_vec, jnp.tile(pos_vec[-1:], (pad,))])
    W = _row_lanes(cfg)
    PB = _post_block(cfg)
    Cd = cfg.de_dilation_channel
    if cfg.de_skip_channel % PB or cfg.quantization_channel % PB:
        raise NotImplementedError("Cs and Q must share a 128-ish divisor")
    if not interpret and (PB < 128 or Cd % 8 or (cfg.n_blocks * 2 * Cd) % 128):
        # the gate pack's minor dim is zero-padded to 128 lanes host-side,
        # so narrow 2*Cd is fine; the cond_fg row slice still needs the
        # overall table lane-aligned
        raise NotImplementedError(
            "the hardware path needs skip/quantization channels multiples of "
            "128, dilation channels a multiple of 8, and n_blocks*2*Cd a "
            "multiple of 128"
        )
    groups, _ = _grouping(cfg, W)

    ring0, cur0, prev0, s0 = _collect_prime_state(
        params, prime, encoding, cfg, W,
        pos_offset=pos_vec if per_stream_pos else pos_offset,
    )
    if G > 1:
        # repack [tiles, G*S, W] -> [G*tiles, S, W]: group sg's tiles first
        n_tiles = ring0.shape[0]
        ring0 = (
            ring0.reshape(n_tiles, G, S, W)
            .swapaxes(0, 1)
            .reshape(G * n_tiles, S, W)
        )
    w = _build_hbm_weights(params, cfg, dtype, weight_dtype=weight_dtype)
    w_dtype = None if weight_dtype is None else jnp.dtype(weight_dtype)
    buf_dtype = dtype if w_dtype is None else w_dtype
    scale_ops = (
        [w["gate_scale"], w["proj_scale_dense"], w["proj_scale_skip"],
         w["post_scale_blocks"]]
        if w_dtype else []
    )
    F = encoding.shape[1]
    # [F, G*S, C] frame-major tables: one contiguous-row DMA per refresh
    cond_fg = jnp.einsum("bfw,lwc->fblc", encoding, params["cond_fg"])
    cond_fg = cond_fg.reshape(F, S_total, cfg.n_blocks * 2 * Cd)
    cond_post = jnp.swapaxes(
        jnp.einsum("bfw,wc->bfc", encoding, params["cond_post"]), 0, 1
    )  # [F, G*S, Cs]

    poolw = cfg.en_pool_kernel_size
    if per_stream_pos:
        # rebase each stream's table column by its base frame so the
        # kernel-side phase r_s lives in [0, pool): at any step every
        # stream's frame is then w or w+1 (w = t // pool shared), which
        # the kernel serves from two whole-tile staging buffers — see
        # _ae_kernel_hbm's per-stream-clock notes
        abs0 = (pos_vec + P).astype(jnp.int32)  # [G*S] step-0 clocks
        base = abs0 // poolw
        fidx = jnp.clip(
            jnp.arange(F, dtype=jnp.int32)[:, None] + base[None, :], 0, F - 1
        )  # [F, G*S]
        cond_fg = jnp.take_along_axis(cond_fg, fidx[:, :, None], axis=0)
        cond_post = jnp.take_along_axis(cond_post, fidx[:, :, None], axis=0)
        off_op = (abs0 % poolw).astype(jnp.int32)
        off_extra = (jnp.broadcast_to(off_op[:, None], (S_total, 128)),)
    else:
        off_op = jnp.asarray(pos_offset + P, jnp.int32).reshape(1)
        off_extra = ()

    hbm_min_d = hbm_ring_min_dilation if rings_in_hbm else 0
    total = _round_up(n_steps, 128)
    kernel = functools.partial(
        _ae_kernel_hbm, cfg=cfg, total=total, F=F,
        n_stream_groups=G, dtype=dtype, hbm_ring_min_dilation=hbm_min_d,
        per_stream_pos=per_stream_pos, n_streams=S, weight_dtype=w_dtype,
    )
    Cr, Cs, Q = cfg.de_residual_channel, cfg.de_skip_channel, cfg.quantization_channel

    vmem_groups = [
        (d, ls) for d, ls in groups if not (hbm_min_d and d >= hbm_min_d)
    ]
    n_hbm = len(groups) - len(vmem_groups)
    tokens_shape = jax.ShapeDtypeStruct(((total // 128) * S_total, 128), jnp.int32)
    if hbm_min_d:
        out_shape = (tokens_shape, jax.ShapeDtypeStruct(ring0.shape, dtype))
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        )
        aliases = {4: 1}  # ring0 operand -> ring-state output
    else:
        out_shape = tokens_shape
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        aliases = {}
    stage_shapes = [pltpu.VMEM((2, G * S, W), dtype) for _ in range(2 * n_hbm)]
    ring_sem_shapes = (
        [pltpu.SemaphoreType.DMA((n_hbm, 2, G)) for _ in range(2)]
        if n_hbm else []
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(scale_ops)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(off_extra),
        out_specs=out_specs,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((G * d, S, W), dtype) for d, _ in vmem_groups]
        + stage_shapes
        + [
            pltpu.VMEM((4, W + Cr, _round_up(2 * Cd, 128)), buf_dtype),  # gate buffers
            pltpu.VMEM((4, Cd, _round_up(Cr, 128) + Cs), buf_dtype),  # proj buffers
            pltpu.VMEM((2, Cs, PB), buf_dtype),                # post buffers
            pltpu.VMEM((S_total, cfg.n_blocks * 2 * Cd), dtype),  # cond_fg rows
            pltpu.VMEM((S_total, Cs), dtype),                  # cond_post rows
        ]
        + (
            [  # frame w+1 staging (per-stream clocks double-buffer)
                pltpu.VMEM((S_total, cfg.n_blocks * 2 * Cd), dtype),
                pltpu.VMEM((S_total, Cs), dtype),
            ]
            if per_stream_pos
            else []
        )
        + [
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            # cond_sem: one per (table, cur/nxt buffer) when per-stream
            pltpu.SemaphoreType.DMA((2, 2) if per_stream_pos else (2,)),
        ]
        + ring_sem_shapes,
        interpret=interpret,
    )(
        cur0.astype(dtype), prev0.astype(dtype), w["ecur"], w["eprev"],
        ring0.astype(dtype), w["gate"], w["proj"], w["post"],
        cond_fg.astype(dtype), cond_post.astype(dtype),
        *scale_ops, off_op, *off_extra,
    )
    if hbm_min_d:
        out = out[0]
    toks = out.reshape(total // 128, S_total, 128)
    toks = jnp.swapaxes(toks, 0, 1).reshape(S_total, total)[:, :n_steps]
    return jnp.concatenate([s0[:, None], toks[:, : n_steps - 1]], axis=1)[:B]
