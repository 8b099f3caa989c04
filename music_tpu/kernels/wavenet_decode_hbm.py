"""HBM-resident-weights WaveNet decode — double-buffered DMA streaming.

The fully-resident kernel (kernels/wavenet_decode.py) pins every weight in
VMEM, which caps model size at ~16 MB of weights.  This variant keeps only
the activation ring caches + embeddings resident and streams the layer
weights HBM -> VMEM each step through double-buffered scratch slots: while
layer ``i`` computes, layer ``i+1``'s weights are in flight, so the decode
runs at the speed the HBM bandwidth can feed weights — the roofline for
any autoregressive decode whose weights exceed VMEM (reference analog:
wavenet/fast_generate.py:66-141, which re-reads every weight from GPU
memory per sample too).

Per step: ``2L`` layer-block DMAs (gate pack + projection pack) and
``(Cs+Q)/PB`` post-matrix column-block DMAs, all double-buffered; the last
post block's compute overlaps the *next* step's layer-0 prefetch, so the
DMA engine never drains.

Weight packing (built host-side once):
- gate pack  ``[L, W + Cr, round_up(2Cd, 128)]`` — rows [0,W): the
  zero-padded prev-tap weights (the matmul extracts the layer's lanes from
  its group ring row, W = round_up(max_group_layers * Cr, 128) lifts the
  resident kernel's 128-lane group limit); rows [W, W+Cr): the current-tap
  weights.  The minor dim is zero-padded to a full 128-lane boundary so the
  per-layer DMA'd slice stays lane-aligned even for narrow models (the
  full-size shipped config has 2Cd = 64).
- proj pack  ``[L, Cd, Crp + Cs]`` — dense (zero-padded to a 128-lane
  boundary Crp, keeping every DMA'd slice lane-aligned) ‖ skip projections.
- post pack  ``[Cs, Cs + Q]``     — post1 ‖ post2, streamed in PB-lane
  column blocks (PB = 128 when Cs, Q allow).

Int8 weight-only quantization (``weight_dtype=jnp.int8``): the streamed
packs are stored int8 with per-output-column f32 scales (symmetric,
``scale_c = max_r |w_rc| / 127``).  Matmuls are linear in each output
column, so the scale applies exactly AFTER the matmul — the kernel
converts each DMA'd tile to the compute dtype (off the critical path: the
convert depends only on the tile's DMA, not on the activation chain) and
multiplies the matmul result by a resident ``[1, cols]`` scale row (the
[1, C] -> [S, C] sublane broadcast lowers fine — probed on v5e; keeping
the rows unbroadcast saves ~3 MB of VMEM at 40 layers, which is the
difference between fitting and OOM).  Weight HBM traffic — this kernel's
roofline — drops 4x vs f32 / 2x vs bf16; activations, accumulation, and
the ring caches stay in the compute dtype.  Measured on v5e this mode is
convert-bound (docs/BENCHMARKS.md): the per-element dequant cancels the
DMA saving — it ships for HBM *capacity*, not speed.

``int8_matmul=True`` (requires ``weight_dtype=jnp.int8``): the MXU
consumes the streamed int8 weights directly (native s8 x s8 -> s32), so
no weight-tile conversion exists at all.  Activations are dynamically
quantized per matmul — symmetric per-ROW scales
(``row_s = max_l |x_l| / 127``, a lane reduction + lane broadcast, both
Mosaic-legal) — and the exact dequant is the rank-1 outer product of
scales folded post-matmul: ``(x_q @ w_q) * row_s * col_s``.  Measured
honestly (docs/BENCHMARKS.md): the quantize ops sit on the serial
dependency chain and their *latency* cancels the halved weight stream —
bf16-weight parity at 67 MB, slower below; a true win needs static
calibrated activation scales (future work).  Ships for the 4x streamed-
weight HBM capacity; accuracy is behavioral (weight-only exactness no
longer holds): 100% token agreement on trained models
(tests/test_pallas_hbm_decode.py, benchmarks/int8_decode_validation.py).

Everything else (stream discipline, ring caches, one-hot tokens, MXU lane
extraction, sampling, output tiling) matches the resident kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_tpu.models.wavenet import WaveNetConfig
from music_tpu.kernels.wavenet_decode import (
    N_STREAMS,
    _collect_prime_state,
    _grouping,
    _round_up,
)


def _row_lanes(cfg: WaveNetConfig) -> int:
    """Ring-row width: widest dilation group, rounded up to full lanes."""
    counts: dict[int, int] = {}
    for d in cfg.dilations:
        counts[d] = counts.get(d, 0) + 1
    return _round_up(max(counts.values()) * cfg.residual_channels, 128)


def _post_block(cfg: WaveNetConfig) -> int:
    Cs, Q = cfg.skip_channels, cfg.quantization_channels
    return min(128, math.gcd(Cs, Q))


def max_stream_groups(
    cfg: WaveNetConfig,
    n_streams: int = N_STREAMS,
    dtype=jnp.float32,
    vmem_budget: int = 14 * 1024 * 1024,
    n_steps: int = 0,
) -> int:
    """How many serving groups fit VMEM for this config.

    The dominant per-group cost is the ring-cache set
    (``sum(distinct dilations) * n_streams * row_lanes`` elements) plus
    the VMEM-resident int32 token output tile (``round_up(n_steps, 128) *
    n_streams * 4`` bytes per group — pass the per-CALL step count; long
    decodes must be chunked by the caller).  The shared cost is the
    gate/proj/post double buffers.  The budget leaves ~2 MB of the 16 MB
    VMEM for one-hots and embeddings.
    """
    itemsize = jnp.dtype(dtype).itemsize
    W = _row_lanes(cfg)
    distinct = sorted({d for d in cfg.dilations})
    ring_bytes = sum(distinct) * n_streams * W * itemsize
    out_bytes = _round_up(n_steps, 128) * n_streams * 4 if n_steps else 0
    Cr, Cd, Cs = cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels
    Cg = _round_up(2 * Cd, 128)
    shared = (
        4 * (W + Cr) * Cg                      # gate buffers
        + 4 * Cd * (_round_up(Cr, 128) + Cs)   # proj buffers
        + 2 * Cs * _post_block(cfg)            # post buffers
    ) * itemsize
    return max(0, (vmem_budget - shared) // (ring_bytes + out_bytes))


def calibrate_act_scales(
    params: dict, cfg: WaveNetConfig, tokens, margin: float = 1.25
) -> tuple:
    """Per-layer static int8 scales for the residual-stream activations.

    Runs the conv forward over representative ``tokens`` ([B, T] µ-law
    codes, e.g. training windows) and records each layer's input-stream
    max; returns ``tuple(max_i * margin / 127)`` for
    ``generate_tokens_fused_hbm(act_scales=...)``.  With static scales
    the quantization of the gate-matmul inputs needs no per-step
    max-reduce on the decode chain and the scale itself folds into the
    gate column scales at pack time; activations beyond the calibrated
    range saturate at ±127 (the ``margin`` headroom guards this)."""
    from music_tpu.models.wavenet import _gate
    from music_tpu.ops.conv import (
        conv1x1, dilated_causal_conv, token_causal_conv,
    )

    x = token_causal_conv(tokens, params["causal"])
    scales = []
    for i, d in enumerate(cfg.dilations):
        scales.append(float(jnp.max(jnp.abs(x))) * margin / 127.0)
        fg = dilated_causal_conv(x, params["fg"][i], dilation=d)
        z = _gate(fg)
        x = conv1x1(z, params["dense"][i]) + x[:, -z.shape[1]:, :]
    return tuple(scales)


def serving_stream_width(cfg: WaveNetConfig, dtype=jnp.bfloat16) -> int:
    """Measured-optimal sublane tile height for HBM-RINGS serving.

    The round-5 stream-shape A/B (docs/BENCHMARKS.md, artifact
    hbm_rings_shapes_ab_r5.json) showed the marginal serving cost at
    S=16/group is small-matmul sublane underutilization: wide tiles batch
    every per-layer matmul across streams — full model (W=128) S16xG8 ->
    S128xG1 halves the step (1.27M -> 2.58M samples/s at 128 streams);
    the scaled model (W=256) peaks around S=32-48.  The optimum tracks
    S*W ~ 16k lanes of tap-matmul operand; wide S only fits VMEM in
    rings mode (a full VMEM ring set at S=128 is ~33 MB).  Returns a
    multiple of the native tile height (8 f32 / 16 bf16), capped at 128
    (the widest shape probed on hardware)."""
    base = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
    W = max(_row_lanes(cfg), 128)
    return int(min(128, max(base, (16384 // W) // base * base)))


def max_stream_groups_hbm_rings(
    cfg: WaveNetConfig,
    n_streams: int = N_STREAMS,
    dtype=jnp.float32,
    min_dilation: int = 32,
    vmem_budget: int = 12 * 1024 * 1024,
    n_steps: int = 0,
) -> int:
    """Serving-group cap with ``rings_in_hbm=True``: only the small-
    dilation rings (d < min_dilation), the per-HBM-group [2, G*S, W]
    tap/write staging pairs and the int32 token output tile
    (``round_up(n_steps, 128) * n_streams * 4`` bytes — pass the per-CALL
    step count) cost VMEM per group — typically ~30-60x less than full
    VMEM rings, so tens of groups fit where 1-2 did."""
    itemsize = jnp.dtype(dtype).itemsize
    W = _row_lanes(cfg)
    distinct = sorted({d for d in cfg.dilations})
    small = [d for d in distinct if d < min_dilation]
    n_hbm = len(distinct) - len(small)
    per_group = (sum(small) + 4 * n_hbm) * n_streams * W * itemsize
    per_group += _round_up(n_steps, 128) * n_streams * 4 if n_steps else 0
    Cr, Cd, Cs = cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels
    Cg = _round_up(2 * Cd, 128)
    shared = (
        4 * (W + Cr) * Cg
        + 4 * Cd * (_round_up(Cr, 128) + Cs)
        + 2 * Cs * _post_block(cfg)
    ) * itemsize
    return max(0, (vmem_budget - shared) // max(per_group, 1))


def _decode_kernel_hbm(
    # VMEM inputs
    cur0_ref,        # [G*S, Q] — one-hot of the first input token
    prev0_ref,       # [G*S, Q] — one-hot of the last prime token
    ecur_ref,        # [Q, Cr]
    eprev_ref,       # [Q, Cr]
    # HBM (ANY) inputs — streamed
    ring_init_hbm,   # [G*sum(d_g), S, W] — packed per-(stream-group, dilation-group) init tiles
    gate_hbm,        # [L, W + Cr, 2Cd]
    proj_hbm,        # [L, Cd, Cr + Cs]
    post_hbm,        # [Cs, Cs + Q]
    *rest,           # ([gscale, pscale, postscale] when int8) + seed (SMEM),
    #                  out [(T//128)*G*S, 128] i32, then scratch: rings per
    #                  group, gate/proj/post double buffers, 3 DMA sems
    cfg: WaveNetConfig,
    total: int,
    n_streams: int,
    n_stream_groups: int,
    dtype,
    weight_dtype,
    int8_matmul: bool,
    act_scales,
    hbm_ring_min_dilation: int,
    batched_ring_dma: bool,
    sample_mode: str,
    temperature: float,
):
    quantized = weight_dtype is not None
    hbm_rings = hbm_ring_min_dilation > 0
    if quantized:
        (gscale_ref, pdscale_ref, pkscale_ref, postscale_ref,
         seed_ref, out_ref, *scratch) = rest
    else:
        seed_ref, out_ref, *scratch = rest
    if hbm_rings:
        # second output: the ANY-space ring state, aliased to ring_init_hbm
        # (large-dilation ring slots live in HBM; see scratch layout below)
        ring_state, *scratch = scratch

    def quant_rows(x, sel=None):
        """Dynamic symmetric per-row int8 quantization of an activation
        tile: returns (q [.., lanes] int8, row_scale [.., 1] f32) with
        x ~= q * row_scale.  ``sel``: optional lane slice the scale is
        computed from — for the group-ring tap row only the layer's own
        Cr-lane chunk feeds nonzero weights, so the scale must come from
        that chunk (a whole-row max would crush small-magnitude layers);
        out-of-chunk lanes clip to ±127 and then multiply zero weights.
        All-zero rows quantize to q=0, scale ~0."""
        xf = x.astype(jnp.float32)
        src = xf if sel is None else sel.astype(jnp.float32)
        m = jnp.maximum(jnp.max(jnp.abs(src), axis=1, keepdims=True), 1e-20)
        q = jnp.round(jnp.clip(xf * (127.0 / m), -127.0, 127.0)).astype(jnp.int8)
        return q, m * (1.0 / 127.0)

    def mm_q8(x, w_q_ref_slice, col_scale, sel=None):
        """x (compute dtype) @ int8 weights -> f32, exact rank-1 dequant:
        (x_q @ w_q) * row_s * col_s."""
        x_q, row_s = quant_rows(x, sel)
        acc = jnp.dot(x_q, w_q_ref_slice, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * row_s * col_scale
    L = cfg.n_blocks
    Cr, Cd, Cs, Q = (
        cfg.residual_channels,
        cfg.dilation_channels,
        cfg.skip_channels,
        cfg.quantization_channels,
    )
    S = n_streams
    G = n_stream_groups  # independent S-stream serving groups sharing the
    # weight stream: each keeps its own legal [S, 128·k] tile + ring cache;
    # per-layer weights are DMA'd ONCE and used by all G groups, so the
    # bandwidth-bound step cost is amortized G ways and the G independent
    # dependency chains hide each other's MXU latency (the compiler rejects
    # sublane tiles wider than 16 streams — this is the serving-depth path)
    NB = 4   # layer-weight buffer slots; prefetch depth NB-1 hides DMA latency
    W = _row_lanes(cfg)
    Crp = _round_up(Cr, 128)  # dense block padded to a lane boundary
    Cg = _round_up(2 * Cd, 128)  # gate-pack minor dim, lane-aligned
    PB = _post_block(cfg)
    n_p1, n_p2 = Cs // PB, Q // PB
    n_post = n_p1 + n_p2
    groups, lane_of_layer = _grouping(cfg, W)
    n_groups = len(groups)
    # group classification: dilations >= hbm_ring_min_dilation keep their
    # ring slots in HBM (the per-step traffic is one [S, W] tile in + out
    # per group — trivial bandwidth — and the slot read at step t was
    # written at t - d, so a one-step-ahead prefetch can never race the
    # write for d >= 3); the small-dilation groups stay in VMEM where they
    # cost almost nothing.  This removes the O(sum d) VMEM ring cost that
    # caps the serving-group count.
    is_hbm = [hbm_rings and d >= hbm_ring_min_dilation for d, _ in groups]
    vmem_idx = [g for g in range(n_groups) if not is_hbm[g]]
    hbm_idx = [g for g in range(n_groups) if is_hbm[g]]
    n_vmem, n_hbm = len(vmem_idx), len(hbm_idx)
    rings_list = scratch[:n_vmem]
    rings = {g: rings_list[k] for k, g in enumerate(vmem_idx)}
    tap_stage = {g: scratch[n_vmem + k] for k, g in enumerate(hbm_idx)}
    wr_stage = {g: scratch[n_vmem + n_hbm + k] for k, g in enumerate(hbm_idx)}
    (gate_buf, proj_buf, post_buf, gate_sem, proj_sem, post_sem,
     *ring_sems) = scratch[n_vmem + 2 * n_hbm:]
    if hbm_rings and n_hbm:
        tap_sem, wr_sem = ring_sems  # each [n_hbm, 2, G]
    layer_group = {}
    for g, (d, layers) in enumerate(groups):
        for i in layers:
            layer_group[i] = g
    ring_base = list(np.cumsum([0] + [d for d, _ in groups[:-1]]))


    def gate_dma(slot, i):
        return pltpu.make_async_copy(
            gate_hbm.at[i], gate_buf.at[slot], gate_sem.at[slot]
        )

    def proj_dma(slot, i):
        return pltpu.make_async_copy(
            proj_hbm.at[i], proj_buf.at[slot], proj_sem.at[slot]
        )

    def post_dma(slot, j):
        return pltpu.make_async_copy(
            post_hbm.at[:, pl.ds(j * PB, PB)], post_buf.at[slot], post_sem.at[slot]
        )

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (S, Q), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    if sample_mode == "categorical":
        pltpu.prng_seed(seed_ref[0])

    def sample(logits):
        if sample_mode == "categorical":
            bits = pltpu.bitcast(pltpu.prng_random_bits((S, Q)), jnp.uint32)
            mant = jnp.bitwise_or(
                jnp.right_shift(bits, jnp.uint32(9)), jnp.uint32(0x3F800000)
            )
            u = pltpu.bitcast(mant, jnp.float32) - 1.0  # [0, 1)
            gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
            logits = logits / temperature + gumbel
        return jnp.argmax(logits, axis=1, keepdims=True).astype(jnp.int32)

    # boot: DMA the ring-cache init from HBM (a VMEM-resident init input
    # would double the cache footprint and blow the 16 MB budget), then
    # warm up layer 0's weights for step 0.  Stream group sg's dilation
    # group g occupies rows [sg*d_g, (sg+1)*d_g) of rings[g], and rows
    # [sg*sum(d) + ring_base[g], ...) of the packed init (sg-major layout);
    # with batched_ring_dma the HBM groups' rows instead live slot-major
    # AFTER the VMEM region (see the wrapper's repack) so that one slot of
    # one dilation group across ALL G stream groups is G contiguous rows —
    # one [G, S, W] DMA per group per step instead of G per-sg DMAs.
    n_tiles = sum(d for d, _ in groups)
    vmem_tiles = sum(groups[g][0] for g in vmem_idx)
    vbase, acc = {}, 0
    for g in vmem_idx:
        vbase[g] = acc
        acc += groups[g][0]
    hbase, acc = {}, 0
    for g in hbm_idx:
        hbase[g] = acc
        acc += groups[g][0]
    # with hbm_rings the init input doubles as the live ring state (it is
    # aliased to the ring_state output) — read all state through ring_state
    ring_src = ring_state if hbm_rings else ring_init_hbm
    for sg in range(G):
        for g in vmem_idx:
            d = groups[g][0]
            row = (
                sg * vmem_tiles + vbase[g]
                if (hbm_rings and batched_ring_dma)
                else sg * n_tiles + ring_base[g]
            )
            init_dma = pltpu.make_async_copy(
                ring_src.at[pl.ds(row, d)],
                rings[g].at[pl.ds(sg * d, d)],
                gate_sem.at[0],
            )
            init_dma.start()
            init_dma.wait()

    def hbm_base(g, sg):
        return sg * n_tiles + ring_base[g]

    if batched_ring_dma:

        def tap_dma(k, g, slot, parity):
            """HBM ring slot (all G stream groups, G contiguous rows) ->
            tap staging (parity half) — ONE DMA per dilation group."""
            return pltpu.make_async_copy(
                ring_state.at[pl.ds(G * vmem_tiles + (hbase[g] + slot) * G, G)],
                tap_stage[g].at[parity],
                tap_sem.at[k, parity],
            )

        def wr_dma(k, g, slot, parity):
            """Write staging (parity half) -> HBM ring slot, all G stream
            groups in one DMA."""
            return pltpu.make_async_copy(
                wr_stage[g].at[parity],
                ring_state.at[pl.ds(G * vmem_tiles + (hbase[g] + slot) * G, G)],
                wr_sem.at[k, parity],
            )

    else:

        def tap_dma(k, g, sg, slot, parity):
            """HBM ring slot -> tap staging (parity half) for (group g, sg)."""
            return pltpu.make_async_copy(
                ring_state.at[hbm_base(g, sg) + slot],
                tap_stage[g].at[parity, pl.ds(sg * S, S)],
                tap_sem.at[k, parity, sg],
            )

        def wr_dma(k, g, sg, slot, parity):
            """Write staging (parity half) -> HBM ring slot for (group g, sg)."""
            return pltpu.make_async_copy(
                wr_stage[g].at[parity, pl.ds(sg * S, S)],
                ring_state.at[hbm_base(g, sg) + slot],
                wr_sem.at[k, parity, sg],
            )

    # prefetch step-0 taps for the HBM-resident groups (slot 0, parity 0)
    for k, g in enumerate(hbm_idx):
        if batched_ring_dma:
            tap_dma(k, g, 0, 0).start()
        else:
            for sg in range(G):
                tap_dma(k, g, sg, 0, 0).start()
    for i0 in range(min(NB - 1, L)):
        gate_dma(i0 % NB, i0).start()
        proj_dma(i0 % NB, i0).start()

    def step(t, carry):
        prev_oh, cur_oh, out_row = carry  # tuples of G per-group arrays

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
            slot = t % d if d > 1 else 0
            slots.append(slot)
        # HBM groups: the step-t taps were prefetched into staging at step
        # t-1 (slot t mod d was last written at step t-d, so the prefetch
        # can never race a write for d >= 3) — wait, then read staging
        for k, g in enumerate(hbm_idx):
            if batched_ring_dma:
                tap_dma(k, g, slots[g], parity).wait()
            else:
                for sg in range(G):
                    tap_dma(k, g, sg, slots[g], parity).wait()
        taps = []   # [G stream groups][dilation group] -> [S, W]
        for sg in range(G):
            row = []
            for g, (d, _) in enumerate(groups):
                if is_hbm[g]:
                    if batched_ring_dma:
                        row.append(tap_stage[g][parity, sg])
                    else:
                        row.append(tap_stage[g][parity, pl.ds(sg * S, S)])
                else:
                    row.append(rings[g][pl.ds(sg * d + slots[g], 1)][0])
            taps.append(row)

        xs = [[] for _ in range(G)]
        skip_acc = [jnp.zeros((S, Cs), jnp.float32) for _ in range(G)]
        for i in range(L):
            slot = i % NB
            nxt = i + NB - 1  # keep NB-1 layers in flight
            if nxt < L:
                gate_dma(nxt % NB, nxt).start()
                proj_dma(nxt % NB, nxt).start()
            if i + 1 == L:  # last layer: start the first post-matrix block
                post_dma(0, 0).start()
            gate_dma(slot, i).wait()
            proj_dma(slot, i).wait()

            if quantized:
                gs = gscale_ref[i]                  # [1, Cg]
                pds = pdscale_ref[i]                # [1, Cr]
                pks = pkscale_ref[i]                # [1, Cs]
                if int8_matmul:
                    # native s8 x s8 MXU path: weights used as-is, zero
                    # conversion; activations dynamic-quantized per matmul
                    gw = gate_buf[slot][:]          # [W+Cr, Cg] int8
                    pw = proj_buf[slot][:]          # [Cd, Crp+Cs] int8
                else:
                    # int8 -> compute-dtype convert, once per DMA'd tile
                    # (shared by all G groups).  Depends only on the DMA,
                    # not on the activation chain, so Mosaic schedules it
                    # off the critical path; per-output-column scales apply
                    # exactly AFTER the matmuls (linearity)
                    gw = gate_buf[slot].astype(dtype)   # [W+Cr, Cg]
                    pw = proj_buf[slot].astype(dtype)   # [Cd, Crp+Cs]

            # one weight DMA serves all G groups; the G chains are
            # independent, so their matmuls interleave in the pipeline
            for sg in range(G):
                tap = taps[sg][layer_group[i]]
                xs[sg].append(x[sg])
                if quantized and int8_matmul:
                    off = lane_of_layer[i]
                    if act_scales is not None:
                        # calibrated static scales: quantization is one
                        # multiply+round+clip (no per-step max-reduce) and
                        # the dequant scale was folded into gs at pack
                        # time; off-chunk tap lanes saturate harmlessly
                        # (they multiply zero weights)
                        inv = 1.0 / act_scales[i]
                        tap_q = jnp.round(jnp.clip(
                            tap.astype(jnp.float32) * inv, -127.0, 127.0
                        )).astype(jnp.int8)
                        x_q = jnp.round(jnp.clip(
                            x[sg].astype(jnp.float32) * inv, -127.0, 127.0
                        )).astype(jnp.int8)
                        acc = jnp.dot(
                            tap_q, gw[:W], preferred_element_type=jnp.int32
                        ) + jnp.dot(
                            x_q, gw[W:], preferred_element_type=jnp.int32
                        )
                        fg = acc.astype(jnp.float32) * gs
                    else:
                        fg = (
                            mm_q8(tap, gw[:W], 1.0, sel=tap[:, off : off + Cr])
                            + mm_q8(x[sg], gw[W:], 1.0)
                        ) * gs
                    # z = tanh * sigmoid is BOUNDED in (-1, 1): its int8
                    # scale is statically 1/127 — no max-reduce on the
                    # chain for the proj matmuls (the largest pack)
                    zf = jnp.tanh(fg[:, :Cd]) * jax.nn.sigmoid(fg[:, Cd : 2 * Cd])
                    z_q = jnp.round(zf * 127.0).astype(jnp.int8)
                    dense = jnp.dot(
                        z_q, pw[:, :Cr], preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (pds * (1.0 / 127.0))
                    x[sg] = (x[sg] + dense).astype(dtype)
                    skip_acc[sg] = skip_acc[sg] + jnp.dot(
                        z_q, pw[:, Crp:], preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (pks * (1.0 / 127.0))
                    continue
                if quantized:
                    fg = jnp.dot(tap, gw[:W], preferred_element_type=jnp.float32)
                    fg = (fg + jnp.dot(x[sg], gw[W:], preferred_element_type=jnp.float32)) * gs
                    z = (jnp.tanh(fg[:, :Cd]) * jax.nn.sigmoid(fg[:, Cd : 2 * Cd])).astype(dtype)
                    x[sg] = (
                        x[sg]
                        + jnp.dot(z, pw[:, :Cr], preferred_element_type=jnp.float32)
                        * pds
                    ).astype(dtype)
                    skip_acc[sg] = skip_acc[sg] + jnp.dot(
                        z, pw[:, Crp:], preferred_element_type=jnp.float32
                    ) * pks
                    continue
                fg = jnp.dot(tap, gate_buf[slot, :W], preferred_element_type=jnp.float32)
                fg = fg + jnp.dot(x[sg], gate_buf[slot, W:], preferred_element_type=jnp.float32)
                z = (jnp.tanh(fg[:, :Cd]) * jax.nn.sigmoid(fg[:, Cd : 2 * Cd])).astype(dtype)
                x[sg] = (x[sg] + jnp.dot(z, proj_buf[slot, :, :Cr], preferred_element_type=jnp.float32)).astype(dtype)
                skip_acc[sg] = skip_acc[sg] + jnp.dot(
                    z, proj_buf[slot, :, Crp:], preferred_element_type=jnp.float32
                )

        for g, (d, layers) in enumerate(groups):
            pad = W - len(layers) * Cr
            k = hbm_idx.index(g) if is_hbm[g] else -1
            if is_hbm[g]:
                # HBM group: drain the write DMA that last used this
                # staging parity half (issued at step t-2) before
                # overwriting it — ONE wait per group when batched
                @pl.when(t >= 2)
                def _(k=k, g=g, d=d):
                    if batched_ring_dma:
                        wr_dma(k, g, (t - 2) % d if d > 1 else 0, parity).wait()
                    else:
                        for sg in range(G):
                            wr_dma(
                                k, g, sg, (t - 2) % d if d > 1 else 0, parity
                            ).wait()
            for sg in range(G):
                pieces = [xs[sg][i] for i in layers]
                if pad:
                    pieces.append(jnp.zeros((S, pad), dtype))
                new_tile = jnp.concatenate(pieces, axis=1)  # [S, W]
                if not is_hbm[g]:
                    rings[g][pl.ds(sg * d + slots[g], 1)] = new_tile[None]
                elif batched_ring_dma:
                    wr_stage[g][parity, sg] = new_tile
                else:
                    wr_stage[g][parity, pl.ds(sg * S, S)] = new_tile
                    wr_dma(k, g, sg, slots[g], parity).start()
            if is_hbm[g] and batched_ring_dma:
                # all G tiles staged -> one [G, S, W] DMA to the slot rows
                wr_dma(k, g, slots[g], parity).start()

        # prefetch the NEXT step's taps for the HBM groups (their slots
        # were written >= (min d - 1) steps ago, and that write's DMA was
        # semaphore-drained at most two steps later — no ordering hazard)
        @pl.when(t + 1 < total)
        def _():
            for k, g in enumerate(hbm_idx):
                d = groups[g][0]
                if batched_ring_dma:
                    tap_dma(k, g, (t + 1) % d, nparity).start()
                else:
                    for sg in range(G):
                        tap_dma(k, g, sg, (t + 1) % d, nparity).start()

        # post1 column blocks -> h2; post2 column blocks -> logits
        h = [jax.nn.relu(skip_acc[sg]).astype(dtype) for sg in range(G)]
        if quantized and int8_matmul:
            # one LHS quantization serves every column block
            h_quant = [quant_rows(h[sg]) for sg in range(G)]
        h2_blocks = [[] for _ in range(G)]
        for j in range(n_p1):
            slot = j % 2
            if j + 1 < n_post:
                post_dma((j + 1) % 2, j + 1).start()
            post_dma(slot, j).wait()
            if quantized and int8_matmul:
                pb = post_buf[slot][:]
                for sg in range(G):
                    h_q, h_s = h_quant[sg]
                    hj = jnp.dot(
                        h_q, pb, preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * h_s * postscale_ref[j]
                    h2_blocks[sg].append(jax.nn.relu(hj).astype(dtype))
                continue
            pb = post_buf[slot].astype(dtype) if quantized else post_buf[slot]
            for sg in range(G):
                hj = jnp.dot(h[sg], pb, preferred_element_type=jnp.float32)
                if quantized:
                    hj = hj * postscale_ref[j]
                h2_blocks[sg].append(jax.nn.relu(hj).astype(dtype))
        h2 = [jnp.concatenate(h2_blocks[sg], axis=1) for sg in range(G)]  # [S, Cs]
        if quantized and int8_matmul:
            h2_quant = [quant_rows(h2[sg]) for sg in range(G)]
        logit_blocks = [[] for _ in range(G)]
        for j2 in range(n_p2):
            j = n_p1 + j2
            slot = j % 2
            if j + 1 < n_post:
                post_dma((j + 1) % 2, j + 1).start()
            else:
                # overlap the NEXT step's layer-0 prefetch with the tail
                @pl.when(t + 1 < total)
                def _():
                    for i0 in range(min(NB - 1, L)):
                        gate_dma(i0 % NB, i0).start()
                        proj_dma(i0 % NB, i0).start()
            post_dma(slot, j).wait()
            if quantized and int8_matmul:
                pb = post_buf[slot][:]
                for sg in range(G):
                    h2_q, h2_s = h2_quant[sg]
                    logit_blocks[sg].append(
                        jnp.dot(
                            h2_q, pb, preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * h2_s * postscale_ref[j]
                    )
                continue
            pb = post_buf[slot].astype(dtype) if quantized else post_buf[slot]
            for sg in range(G):
                lj = jnp.dot(h2[sg], pb, preferred_element_type=jnp.float32)
                if quantized:
                    lj = lj * postscale_ref[j]
                logit_blocks[sg].append(lj)
        logits = [jnp.concatenate(logit_blocks[sg], axis=1) for sg in range(G)]

        next_tok = [sample(logits[sg]) for sg in range(G)]  # [S, 1] each
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
        0,
        total,
        step,
        (
            tuple(prev0_ref[pl.ds(sg * S, S)] for sg in range(G)),
            tuple(cur0_ref[pl.ds(sg * S, S)] for sg in range(G)),
            tuple(jnp.zeros((S, 128), jnp.int32) for _ in range(G)),
        ),
    )

    # drain the last two steps' HBM ring writes (their sems are normally
    # waited two steps later, which never comes for t = total-1, total-2)
    for t_last in range(max(total - 2, 0), total):
        for k, g in enumerate(hbm_idx):
            d = groups[g][0]
            if batched_ring_dma:
                wr_dma(k, g, t_last % d if d > 1 else 0, t_last % 2).wait()
            else:
                for sg in range(G):
                    wr_dma(
                        k, g, sg, t_last % d if d > 1 else 0, t_last % 2
                    ).wait()


def _quantize_cols(w: jax.Array, axis: int):
    """Symmetric int8 per-output-column quantization along ``axis``.

    Returns (q, scale) with dequantization ``q * scale``; all-zero columns
    (lane padding) get scale 1 so they dequantize to exact zeros."""
    scale = jnp.max(jnp.abs(w), axis=axis, keepdims=True) / 127.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _build_hbm_weights(
    params: dict,
    cfg: WaveNetConfig,
    dtype=jnp.float32,
    weight_dtype=None,
):
    """Pack the model pytree into the three streamed HBM layouts.

    ``weight_dtype=jnp.int8`` stores the packs int8 with per-output-column
    f32 scales as ``[.., 1, cols]`` rows (the kernel applies them
    elementwise post-matmul via a [1, C] -> [S, C] sublane broadcast,
    which Mosaic lowers fine — probed on hardware)."""
    L, Cr, Cd, Cs = (
        cfg.n_blocks,
        cfg.residual_channels,
        cfg.dilation_channels,
        cfg.skip_channels,
    )
    W = _row_lanes(cfg)
    _, lane_of_layer = _grouping(cfg, W)

    Cg = _round_up(2 * Cd, 128)  # minor dim lane-aligned for the sliced DMA
    gate = jnp.zeros((L, W + Cr, Cg), jnp.float32)
    for i in range(L):
        off = lane_of_layer[i]
        gate = gate.at[i, off : off + Cr, : 2 * Cd].set(params["fg"][i, 0])  # prev tap
        gate = gate.at[i, W : W + Cr, : 2 * Cd].set(params["fg"][i, 1])      # cur tap
    Crp = _round_up(Cr, 128)
    dense_p = jnp.zeros((L, Cd, Crp), jnp.float32).at[:, :, :Cr].set(params["dense"])
    proj = jnp.concatenate([dense_p, params["skip"]], axis=2)  # [L,Cd,Crp+Cs]
    post = jnp.concatenate([params["post1"], params["post2"]], axis=1)  # [Cs,Cs+Q]
    out = {
        "ecur": params["causal"][1].astype(dtype),
        "eprev": params["causal"][0].astype(dtype),
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
    # Scales are stored pre-split/pre-blocked so the kernel multiplies each
    # matmul result by a WHOLE [1, cols] row: Mosaic accepts the
    # [1,C] -> [S,C] sublane broadcast but rejects it when the source is a
    # lane-SLICE of a wider row (probed: `acc * ps[:, Crp:]` fails with
    # "Invalid input layout" on a (1xC) vector.broadcast, the unsliced
    # variants compile).
    PB = _post_block(cfg)
    n_post = (Cs + cfg.quantization_channels) // PB
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


def dequantized_params(params: dict, cfg: WaveNetConfig) -> dict:
    """The params pytree the ``weight_dtype=jnp.int8`` kernel actually
    computes with: pack -> int8 quantize -> dequantize -> unpack.

    Running the plain lax.scan decoder (models/wavenet.generate_tokens) on
    this pytree is the exact reference for the quantized kernel — used by
    the token-exactness tests and by callers who want to evaluate the
    quantization error of a trained model host-side."""
    L, Cr, Cd, Cs = (
        cfg.n_blocks,
        cfg.residual_channels,
        cfg.dilation_channels,
        cfg.skip_channels,
    )
    W = _row_lanes(cfg)
    _, lane_of_layer = _grouping(cfg, W)
    Crp = _round_up(Cr, 128)
    w = _build_hbm_weights(params, cfg, weight_dtype=jnp.int8)
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
        post1=post[:, :Cs],
        post2=post[:, Cs:],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "interpret", "n_streams", "dtype", "sample_mode",
        "temperature", "n_stream_groups", "weight_dtype", "int8_matmul",
        "act_scales", "rings_in_hbm", "hbm_ring_min_dilation",
        "batched_ring_dma",
    ),
)
def generate_tokens_fused_hbm(
    params: dict,
    prime: jax.Array,
    *,
    cfg: WaveNetConfig,
    n_steps: int,
    interpret: bool = False,
    n_streams: int = N_STREAMS,
    n_stream_groups: int = 1,
    dtype=jnp.float32,
    weight_dtype=None,
    int8_matmul: bool = False,
    act_scales: tuple | None = None,
    rings_in_hbm: bool = False,
    hbm_ring_min_dilation: int = 32,
    batched_ring_dma: bool = True,
    sample_mode: str = "argmax",
    temperature: float = 1.0,
    seed: int = 0,
) -> jax.Array:
    """Generate ``n_steps`` codes per stream with weights streamed from HBM.

    Same contract as :func:`kernels.wavenet_decode.generate_tokens_fused`
    but with no VMEM ceiling on model size: use this for scaled configs
    (wide skip/residual channels) whose weights exceed ~12 MB.  Exactness
    vs the lax.scan reference is verified in tests/test_pallas_hbm_decode.py.

    ``n_stream_groups=G`` decodes ``G * n_streams`` independent streams in
    one kernel: each group keeps its own legal [n_streams, lanes] tile and
    ring cache while the per-step weight stream (this kernel's roofline) is
    shared by all groups — the serving-depth answer to the compiler's
    16-stream sublane-tile ceiling.  VMEM grows by one ring-cache set per
    extra group (~sum(d)·S·W bytes).

    ``weight_dtype=jnp.int8`` streams int8 weight-only-quantized packs
    (per-output-column scales, applied exactly post-matmul) — 4x less
    weight HBM traffic than f32, 2x less than bf16 weights, on this
    bandwidth-bound kernel.  Token-exact vs the scan decoder run on
    :func:`dequantized_params`; quantization error vs the full-precision
    model is a property of the trained weights, measurable host-side with
    the same helper.

    ``rings_in_hbm=True`` keeps ring slots of dilation groups with
    ``d >= hbm_ring_min_dilation`` in HBM (the ring-init input is aliased
    to an ANY-space output and becomes the live ring state), with the
    step-t tap tiles prefetched into VMEM staging one step ahead — the
    per-step ring traffic is only one [S, W] tile in + out per large
    group, while the VMEM ring cost (the binding constraint on
    ``n_stream_groups``) collapses from O(sum d) to O(sum of small d) —
    the serving-scale mode: more concurrent stream groups per chip than
    VMEM-resident rings allow.  Token-exact vs the VMEM-ring path.

    ``batched_ring_dma`` (default True, only meaningful with
    ``rings_in_hbm``): pack the HBM groups' ring slots slot-major so one
    slot of one dilation group across ALL G stream groups is G contiguous
    rows — the per-step ring traffic becomes ONE [G, S, W] DMA in + out
    per dilation group instead of G per-stream-group DMAs (the DMA
    issue/wait count was the dominant per-group marginal cost at large G;
    docs/BENCHMARKS.md "HBM ring state").  ``False`` keeps the round-2
    per-(group, sg) scheme for A/B comparison.
    """
    if cfg.filter_width != 2:
        raise NotImplementedError("fused decode assumes filter_width=2")
    if cfg.use_bias:
        raise NotImplementedError("fused decode assumes use_bias=False")
    if rings_in_hbm and hbm_ring_min_dilation < 3 and not interpret:
        # the one-step-ahead tap prefetch reads slot (t+1) mod d while step
        # t's write to slot t mod d may still be in flight; that is race-free
        # only when d >= 3 (the write landed >= 2 steps earlier).  interpret
        # mode is safe because its DMAs are synchronous.
        raise NotImplementedError(
            "rings_in_hbm requires hbm_ring_min_dilation >= 3 on hardware: "
            "d<3 ring groups must stay in VMEM (tap prefetch races the "
            "previous step's ring write for d=1/2)"
        )
    B = prime.shape[0]
    S = n_streams
    G = n_stream_groups
    S_total = G * S
    if B > S_total:
        raise ValueError(f"at most {S_total} streams, got {B}")
    if B < S_total:
        prime = jnp.concatenate(
            [prime, jnp.tile(prime[-1:], (S_total - B, 1))], axis=0
        )
    W = _row_lanes(cfg)
    PB = _post_block(cfg)
    if cfg.skip_channels % PB or cfg.quantization_channels % PB:
        raise NotImplementedError("Cs and Q must share a 128-ish divisor")
    if not interpret and (PB < 128 or cfg.dilation_channels % 8):
        # hardware DMA'd blocks must be 128-lane aligned in their minor dim
        # (the gate pack is zero-padded to 128 lanes host-side, so narrow
        # 2*Cd is fine) and 8-sublane aligned in the second-to-minor;
        # tiny configs are interpret-mode (test) territory anyway
        raise NotImplementedError(
            "the hardware path needs skip_channels and quantization_channels "
            "multiples of 128 and dilation_channels a multiple of 8"
        )
    groups, _ = _grouping(cfg, W)

    ring0, cur0, prev0, s0 = _collect_prime_state(
        params, prime, cfg, W, sample_mode=sample_mode,
        temperature=temperature,
        key=jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32)),
    )
    if G > 1:
        # repack [tiles, G*S, W] -> [G*tiles, S, W]: group sg's tiles first
        n_tiles = ring0.shape[0]
        ring0 = (
            ring0.reshape(n_tiles, G, S, W)
            .swapaxes(0, 1)
            .reshape(G * n_tiles, S, W)
        )
    hbm_min_d = hbm_ring_min_dilation if rings_in_hbm else 0
    if hbm_min_d and batched_ring_dma:
        # slot-major repack of the HBM groups' rows (kernel reads/writes
        # one slot across all G stream groups as G contiguous rows):
        # VMEM-group rows stay sg-major up front, HBM-group rows follow as
        # (group, slot, sg)
        n_tiles = sum(d for d, _ in groups)
        ring_base, acc = [], 0
        for d, _ in groups:
            ring_base.append(acc)
            acc += d
        vmem_g = [g for g, (d, _) in enumerate(groups) if d < hbm_min_d]
        hbm_g = [g for g, (d, _) in enumerate(groups) if d >= hbm_min_d]
        perm = [
            sg * n_tiles + ring_base[g] + slot
            for sg in range(G)
            for g in vmem_g
            for slot in range(groups[g][0])
        ] + [
            sg * n_tiles + ring_base[g] + slot
            for g in hbm_g
            for slot in range(groups[g][0])
            for sg in range(G)
        ]
        ring0 = ring0[np.asarray(perm, np.int32)]
    ring0, cur0, prev0 = ring0.astype(dtype), cur0.astype(dtype), prev0.astype(dtype)
    w = _build_hbm_weights(params, cfg, dtype, weight_dtype=weight_dtype)
    w_dtype = None if weight_dtype is None else jnp.dtype(weight_dtype)
    buf_dtype = dtype if w_dtype is None else w_dtype
    if int8_matmul and w_dtype != jnp.int8:
        raise ValueError("int8_matmul requires weight_dtype=jnp.int8")
    if act_scales is not None:
        if not int8_matmul:
            raise ValueError("act_scales requires int8_matmul=True")
        if len(act_scales) != cfg.n_blocks:
            raise ValueError("need one act scale per block")
        # fold the static activation scales into the gate column scales:
        # fg = (tap_q @ Wq + x_q @ Wq) * (act_scale_i * col_scale) exactly
        w["gate_scale"] = w["gate_scale"] * jnp.asarray(
            act_scales, jnp.float32
        )[:, None, None]

    total = _round_up(n_steps, 128)
    kernel = functools.partial(
        _decode_kernel_hbm, cfg=cfg, total=total, n_streams=S,
        n_stream_groups=G, dtype=dtype, weight_dtype=w_dtype,
        int8_matmul=int8_matmul, act_scales=act_scales,
        hbm_ring_min_dilation=hbm_min_d,
        batched_ring_dma=batched_ring_dma,
        sample_mode=sample_mode, temperature=temperature,
    )
    Cr, Cd, Cs, Q = (
        cfg.residual_channels, cfg.dilation_channels,
        cfg.skip_channels, cfg.quantization_channels,
    )

    scale_ops = (
        [w["gate_scale"], w["proj_scale_dense"], w["proj_scale_skip"],
         w["post_scale_blocks"]]
        if w_dtype else []
    )
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
        aliases = {4: 1}  # ring0 operand -> ring-state output (in place)
    else:
        out_shape = tokens_shape
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        aliases = {}
    stage_shape = (2, G, S, W) if batched_ring_dma else (2, G * S, W)
    stage_shapes = (
        [pltpu.VMEM(stage_shape, dtype) for _ in range(2 * n_hbm)]
    )
    sem_shape = (n_hbm, 2) if batched_ring_dma else (n_hbm, 2, G)
    ring_sem_shapes = (
        [pltpu.SemaphoreType.DMA(sem_shape) for _ in range(2)]
        if n_hbm else []
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(scale_ops)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((G * d, S, W), dtype) for d, _ in vmem_groups]
        + stage_shapes
        + [
            pltpu.VMEM((4, W + Cr, _round_up(2 * Cd, 128)), buf_dtype),  # gate buffers (NB=4)
            pltpu.VMEM((4, Cd, _round_up(Cr, 128) + Cs), buf_dtype),  # proj buffers
            pltpu.VMEM((2, Cs, PB), buf_dtype),       # post double buffer
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + ring_sem_shapes,
        interpret=interpret,
    )(
        cur0, prev0, w["ecur"], w["eprev"],
        ring0, w["gate"], w["proj"], w["post"],
        *scale_ops,
        jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)),  # trace-safe (seed may be a jit operand)
    )
    if hbm_min_d:
        out = out[0]  # (tokens, final ring state) — state only aliases ring0
    toks = out.reshape(total // 128, S_total, 128)
    toks = jnp.swapaxes(toks, 0, 1).reshape(S_total, total)[:, :n_steps]
    return jnp.concatenate([s0[:, None], toks[:, : n_steps - 1]], axis=1)[:B]
