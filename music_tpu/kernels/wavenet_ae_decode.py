"""Fused conditioned decode for the WaveNet autoencoder — one Pallas kernel.

Same architecture as :mod:`music_tpu.kernels.wavenet_decode` (per-dilation
ring buffers of aligned tiles, one-hot token embedding, batched skip GEMM,
lane-masked output) plus NSynth-style global conditioning
(wavenet_autoencoder/model1.py:183,216-219): each residual block's
filter/gate preactivation and the post-process stage receive a bias derived
from the bottleneck encoding frame covering the current timestep.

Conditioning the TPU way: the per-frame projected biases
(``encoding @ cond_fg`` / ``encoding @ cond_post``) are precomputed outside
and shipped as ``[F, L*2Cd]`` / ``[F, Cs]`` VMEM tables.  A frame spans
``pool`` samples, so inside the kernel the current row is materialized into
persistent VMEM scratch only on frame boundaries — via a one-hot
``(iota == t // pool)`` MXU matmul (the same trick as token embedding; no
dynamic sublane reads, no broadcasts), under ``@pl.when(t % pool == 0)``.

Reference contrast: wavenet_autoencoder/generate.py re-runs a full
receptive-field forward per sample (and its conditioning projections are
untrained per-call modules — docs/DIVERGENCES.md #10).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_tpu.models.wavenet_ae import WaveNetAEConfig
from music_tpu.ops.conv import conv1x1, dilated_causal_conv, token_causal_conv

N_STREAMS = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def max_stream_groups(
    cfg: WaveNetAEConfig,
    dtype=jnp.float32,
    vmem_budget: int = 14 * 1024 * 1024,
    n_steps: int = 0,
    n_frames: int = 0,
    n_streams: int = N_STREAMS,
) -> int:
    """Serving groups that fit VMEM next to the resident weights — the AE
    analog of :func:`kernels.wavenet_decode.max_stream_groups`.

    Per-group cost: one ring-cache set, the per-stream conditioning
    tables (``S * n_frames`` rows of ``L*2Cd + Cs`` — VMEM inputs), the
    current-row staging, and the int32 output tile for one
    ``n_steps``-step call.  Shared: the repacked weights.  Returns 0 when
    the weights alone don't fit (use the HBM-streaming kernel)."""
    itemsize = jnp.dtype(dtype).itemsize
    S = n_streams
    L, Cr, Cd, Cs, Q = (
        cfg.n_blocks, cfg.de_residual_channel, cfg.de_dilation_channel,
        cfg.de_skip_channel, cfg.quantization_channel,
    )
    ring_bytes = sum({d for d in cfg.dilations}) * S * 128 * itemsize
    cond_rows = L * 2 * Cd + Cs
    cond_tab_bytes = S * max(n_frames, 1) * cond_rows * itemsize
    cond_cur_bytes = S * cond_rows * itemsize
    out_bytes = _round_up(n_steps, 128) * S * 4 if n_steps else 0
    weight_bytes = (
        L * (128 * 2 * Cd + Cr * 2 * Cd + Cd * Cr)
        + L * Cd * Cs + Cs * Cs + Cs * Q
        + 2 * Q * Cr
    ) * itemsize
    per_group = ring_bytes + cond_tab_bytes + cond_cur_bytes + out_bytes
    return max(0, (vmem_budget - weight_bytes) // per_group)


def _grouping(cfg: WaveNetAEConfig, row_lanes: int = 128):
    Cr = cfg.de_residual_channel
    order: list[int] = []
    members: dict[int, list[int]] = {}
    for i, d in enumerate(cfg.dilations):
        if d not in members:
            members[d] = []
            order.append(d)
        members[d].append(i)
    groups = [(d, members[d]) for d in order]
    lane_of_layer = {}
    for d, layers in groups:
        if len(layers) * Cr > row_lanes:
            raise NotImplementedError(
                f"group exceeds one {row_lanes}-lane row (use the "
                "HBM-streaming variant, kernels.wavenet_ae_decode_hbm)"
            )
        for k, i in enumerate(layers):
            lane_of_layer[i] = k * Cr
    return groups, lane_of_layer


def _build_kernel_weights(params: dict, cfg: WaveNetAEConfig, dtype):
    L, Cr, Cd, Cs = (
        cfg.n_blocks,
        cfg.de_residual_channel,
        cfg.de_dilation_channel,
        cfg.de_skip_channel,
    )
    _, lane_of_layer = _grouping(cfg)
    fgp = jnp.zeros((L, 128, 2 * Cd), jnp.float32)
    for i in range(L):
        off = lane_of_layer[i]
        fgp = fgp.at[i, off : off + Cr].set(params["fg"][i, 0])
    w = {
        "ecur": params["de_causal"][1],
        "eprev": params["de_causal"][0],
        "fgp": fgp,
        "fgc": params["fg"][:, 1],
        "densew": params["dense"],
        "skipw": params["skip"].reshape(L * Cd, Cs),
        "post1": params["conn1"],
        "post2": params["conn2"],
    }
    return {k: v.astype(dtype) for k, v in w.items()}


def _collect_prime_state(params: dict, prime: jax.Array, encoding: jax.Array,
                         cfg: WaveNetAEConfig, row_lanes: int = 128,
                         pos_offset=0):
    """Parallel prime over the conditioned decoder; extracts ring init tiles
    (slot k of group g <- abs time P - d_g + k) and boot one-hots.

    ``pos_offset``: absolute time of ``prime[:, 0]`` — nonzero when a long
    decode is chunked and re-primed from a mid-utterance tail, so the
    per-frame conditioning stays aligned to the utterance clock.  A scalar
    or a per-stream ``[B]`` vector (streams of an AEDecodeSession sit at
    different utterance clocks)."""
    L, Cr, Q = cfg.n_blocks, cfg.de_residual_channel, cfg.quantization_channel
    Cd = cfg.de_dilation_channel
    D_max = max(cfg.dilations)
    P = prime.shape[1]
    need = cfg.receptive_field + D_max
    if P < need:
        raise ValueError(f"prime length {P} < receptive_field + max_dilation = {need}")
    groups, lane_of_layer = _grouping(cfg, row_lanes)
    B = prime.shape[0]
    pos_vec = jnp.broadcast_to(
        jnp.asarray(pos_offset, jnp.int32).reshape(-1), (B,)
    )

    x = token_causal_conv(prime, params["de_causal"])
    streams = [x]
    offsets = [1]
    z_last = []  # each layer's gated activation at absolute time P-1
    for i, d in enumerate(cfg.dilations):
        fg = dilated_causal_conv(x, params["fg"][i], dilation=d)
        # conditioning aligned to absolute time: activation index j of this
        # stream is abs time j + offsets[-1] + d — matching the scan
        # decoder's frame = t // pool semantics
        o = offsets[-1] + d
        frames = jnp.minimum(
            (jnp.arange(fg.shape[1])[None, :] + o + pos_vec[:, None])
            // cfg.en_pool_kernel_size,
            encoding.shape[1] - 1,
        )  # [B, T] — per-stream utterance clocks
        proj = jnp.einsum("bfw,wc->bfc", encoding, params["cond_fg"][i])
        cond = jnp.take_along_axis(
            proj, frames[:, :, None].astype(jnp.int32), axis=1
        )
        fg = fg + cond
        z = jnp.tanh(fg[..., Cd:]) * jax.nn.sigmoid(fg[..., :Cd])
        z_last.append(z[:, P - 1 - o, :])
        x = conv1x1(z, params["dense"][i]) + x[:, -fg.shape[1]:, :]
        streams.append(x)
        offsets.append(o)

    S = prime.shape[0]
    total_tiles = sum(d for d, _ in groups)
    init = jnp.zeros((total_tiles, S, row_lanes), jnp.float32)
    base = 0
    for g, (d, layers) in enumerate(groups):
        for i in layers:
            s, o = streams[i], offsets[i]
            seg = s[:, P - d - o : P - o, :]
            seg = jnp.swapaxes(seg, 0, 1)
            lane = lane_of_layer[i]
            init = init.at[base : base + d, :, lane : lane + Cr].set(seg)
        base += d

    # first sampled token s_0 from the prime streams (same absolute-time
    # conditioning as the kernel; the model's decode() uses ratio-based
    # upsampling and would disagree on frame boundaries)
    Cs = cfg.de_skip_channel
    z_all = jnp.concatenate(z_last, axis=-1)  # [S, L*Cd]
    h = jax.nn.relu(z_all @ params["skip"].reshape(-1, Cs))
    frame_last = jnp.minimum(
        (pos_vec + P - 1) // cfg.en_pool_kernel_size, encoding.shape[1] - 1
    )  # [B]
    cond_post_last = jnp.einsum(
        "bw,wc->bc",
        jnp.take_along_axis(
            encoding, frame_last[:, None, None].astype(jnp.int32), axis=1
        )[:, 0],
        params["cond_post"],
    )
    h = jax.nn.relu(h @ params["conn1"] + cond_post_last)
    logits = h @ params["conn2"]
    s0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    cur0 = jax.nn.one_hot(s0, Q, dtype=jnp.float32)
    prev0 = jax.nn.one_hot(prime[:, -1], Q, dtype=jnp.float32)
    return init, cur0, prev0, s0


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_steps", "interpret", "dtype", "n_stream_groups", "n_streams"))
def generate_tokens_fused(
    params: dict,
    encoding: jax.Array,
    prime: jax.Array,
    *,
    cfg: WaveNetAEConfig,
    n_steps: int,
    interpret: bool = False,
    dtype=jnp.float32,
    pos_offset=0,
    n_stream_groups: int = 1,
    n_streams: int = N_STREAMS,
) -> jax.Array:
    """Conditioned fused decode: ``n_steps`` codes per stream after priming.

    ``encoding``: [B, F, W] bottleneck frames (from models.wavenet_ae.encode);
    frame alignment is absolute-time: decode position ``pos_offset +
    prime_len + t`` uses frame ``(pos_offset + prime_len + t) // pool``
    (``pos_offset`` > 0 when a chunked long decode re-primes from a
    mid-utterance tail — generate/wavenet_ae_generate.py).  ``pos_offset``
    may also be a per-stream ``[B]`` vector: every stream keeps its OWN
    utterance clock (AEDecodeSession streams join at different times);
    the conditioning refresh fires whenever ANY stream crosses a frame
    boundary and selects each stream's frame independently.

    ``n_stream_groups=G`` serves ``G * 8`` independent streams from one
    kernel — each group keeps its own sublane tile, ring-cache set, and
    conditioning tables, and the G dependency chains interleave in the
    pipeline (the same scheme as kernels/wavenet_decode.py; VMEM sizing
    via :func:`max_stream_groups`).
    """
    if cfg.filter_width != 2:
        raise NotImplementedError("fused decode assumes filter_width=2")
    B, P = prime.shape
    S = n_streams  # 8 (f32) / 16 (bf16): the native sublane tile heights
    G = n_stream_groups
    S_total = G * S
    if B > S_total:
        raise ValueError(f"at most {S_total} streams, got {B}")
    pos_vec = jnp.broadcast_to(jnp.asarray(pos_offset, jnp.int32).reshape(-1), (B,))
    if B < S_total:
        pad = S_total - B
        prime = jnp.concatenate([prime, jnp.tile(prime[-1:], (pad, 1))], axis=0)
        encoding = jnp.concatenate(
            [encoding, jnp.tile(encoding[-1:], (pad, 1, 1))], axis=0
        )
        pos_vec = jnp.concatenate([pos_vec, jnp.tile(pos_vec[-1:], (pad,))])
    groups, _ = _grouping(cfg)

    ring0, cur0, prev0, s0 = _collect_prime_state(
        params, prime, encoding, cfg, pos_offset=pos_vec
    )
    if G > 1:
        # repack [tiles, G*S, 128] -> [G*tiles, S, 128]: group sg's tiles first
        n_tiles = ring0.shape[0]
        ring0 = (
            ring0.reshape(n_tiles, G, S, 128)
            .swapaxes(0, 1)
            .reshape(G * n_tiles, S, 128)
        )
    w = _build_kernel_weights(params, cfg, dtype)
    # per-frame bias tables, one table per GROUP: conditioning is
    # per-stream, so within group sg the frame axis is S*F with stream
    # s's frames at rows [s*F, (s+1)*F) and the kernel's one-hot compares
    # each sublane s against s*F + frame.
    F = encoding.shape[1]
    cond_fg = jnp.einsum("bfw,lwc->bflc", encoding, params["cond_fg"])
    cond_fg = cond_fg.reshape(G, S * F, cfg.n_blocks * 2 * cfg.de_dilation_channel)
    cond_post = jnp.einsum("bfw,wc->bfc", encoding, params["cond_post"])
    cond_post = cond_post.reshape(G, S * F, cfg.de_skip_channel)

    total = _round_up(n_steps, 128)
    kernel = functools.partial(
        _ae_kernel_wrapper, cfg=cfg, total=total, F=F, dtype=dtype, G=G, S=S
    )

    # step-0 frame offsets, twice: an SMEM [G*S] vector for the cheap
    # any-stream-crossed refresh predicate, and a lane-replicated
    # [G*S, S*F] i32 tile so the per-stream frame math is pure elementwise
    # vector ops (no sublane/lane broadcasts in the kernel)
    off0 = pos_vec + P
    off_lanes = jnp.broadcast_to(off0[:, None], (S_total, S * F)).astype(jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((total // 128) * S_total, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * d, S, 128), dtype) for d, _ in groups]
        + [
            pltpu.VMEM((S_total, cfg.n_blocks * 2 * cfg.de_dilation_channel), dtype),
            pltpu.VMEM((S_total, cfg.de_skip_channel), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        ring0.astype(dtype), cur0.astype(dtype), prev0.astype(dtype),
        w["ecur"], w["eprev"], w["fgp"], w["fgc"], w["densew"], w["skipw"],
        w["post1"], w["post2"],
        cond_fg.astype(dtype), cond_post.astype(dtype),
        off_lanes,
        jnp.asarray(off0, jnp.int32).reshape(S_total),
    )
    toks = out.reshape(total // 128, S_total, 128)
    toks = jnp.swapaxes(toks, 0, 1).reshape(S_total, total)[:, :n_steps]
    return jnp.concatenate([s0[:, None], toks[:, : n_steps - 1]], axis=1)[:B]


def _ae_kernel_wrapper(*refs, cfg, total, F, dtype, G=1, S=N_STREAMS):
    """Adapter handling the per-stream conditioning one-hot: within group
    sg, stream s's frame f lives at row s*F + f of the group's cond table,
    so the one-hot compares against ``s*F + frame`` per sublane.  The
    absolute-time offset of step 0 (pos_offset + prime_len) arrives as a
    dynamic SMEM vector so chunked long decodes do NOT recompile per
    chunk.  ``G`` serving groups unroll the step body (one ring/cond set
    per group; the independent chains interleave in the pipeline — the
    scheme of kernels/wavenet_decode.py)."""
    (ring_init_hbm, cur0_ref, prev0_ref, ecur_ref, eprev_ref, fgp_ref,
     fgc_ref, densew_ref, skipw_ref, post1_ref, post2_ref,
     condfg_ref, condpost_ref, off_lanes_ref, off_ref, out_ref,
     *scratch) = refs

    L = cfg.n_blocks
    Cr, Cd, Cs, Q = (
        cfg.de_residual_channel,
        cfg.de_dilation_channel,
        cfg.de_skip_channel,
        cfg.quantization_channel,
    )
    S_total = G * S
    pool = cfg.en_pool_kernel_size
    groups, lane_of_layer = _grouping(cfg)
    layer_group = {}
    for g, (d, layers) in enumerate(groups):
        for i in layers:
            layer_group[i] = g
    rings = scratch[: len(groups)]
    cond_fg_cur, cond_post_cur = scratch[len(groups)], scratch[len(groups) + 1]
    boot_sem = scratch[len(groups) + 2]
    ring_base = list(np.cumsum([0] + [d for d, _ in groups[:-1]]))

    # boot the ring caches by DMA from HBM: a VMEM-resident init input the
    # same size as the ring scratch would double-count against the 16 MB
    # budget (CLAUDE.md Mosaic rules)
    n_tiles = sum(d for d, _ in groups)
    for sg in range(G):
        for g, (d, _) in enumerate(groups):
            boot = pltpu.make_async_copy(
                ring_init_hbm.at[pl.ds(sg * n_tiles + ring_base[g], d)],
                rings[g].at[pl.ds(sg * d, d)],
                boot_sem,
            )
            boot.start()
            boot.wait()

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (S, Q), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    # per-stream frame rows: within a group, stream s compares s*F + frame
    sf_iota = jax.lax.broadcasted_iota(jnp.int32, (S, S * F), 1)
    stream_base = jax.lax.broadcasted_iota(jnp.int32, (S, S * F), 0) * F

    def refresh_cond(t):
        # per-stream frames: off_lanes is the [G*S, S*F] lane-replicated
        # step-0 clock, so every op stays elementwise on the native tile;
        # group sg's rows are the aligned sublane block [sg*S, (sg+1)*S)
        for sg in range(G):
            off = off_lanes_ref[pl.ds(sg * S, S)]
            frame = jnp.minimum((t + off) // pool, F - 1)
            onehot = (sf_iota == stream_base + frame).astype(dtype)  # [S, S*F]
            cond_fg_cur[pl.ds(sg * S, S)] = jnp.dot(
                onehot, condfg_ref[sg], preferred_element_type=jnp.float32
            ).astype(dtype)
            cond_post_cur[pl.ds(sg * S, S)] = jnp.dot(
                onehot, condpost_ref[sg], preferred_element_type=jnp.float32
            ).astype(dtype)

    def step(t, carry):
        prev_oh, cur_oh, out_row = carry  # tuples of G per-group arrays

        # refresh when ANY stream crosses a frame boundary (streams of a
        # serving session sit at different utterance clocks); G*S scalar
        # reads from SMEM per step
        crossed = (t + off_ref[0]) % pool == 0
        for si in range(1, S_total):
            crossed = jnp.logical_or(crossed, (t + off_ref[si]) % pool == 0)

        @pl.when(jnp.logical_or(crossed, t == 0))
        def _():
            refresh_cond(t)

        x = [
            (
                jnp.dot(cur_oh[sg], ecur_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(prev_oh[sg], eprev_ref[:], preferred_element_type=jnp.float32)
            ).astype(dtype)
            for sg in range(G)
        ]
        cfg_rows = [cond_fg_cur[pl.ds(sg * S, S)] for sg in range(G)]

        slots = []
        for g, (d, layers) in enumerate(groups):
            slots.append(t % d if d > 1 else 0)
        taps = [
            [rings[g][pl.ds(sg * d + slots[g], 1)][0] for g, (d, _) in enumerate(groups)]
            for sg in range(G)
        ]

        xs = [[] for _ in range(G)]
        zs = [[] for _ in range(G)]
        for i in range(L):
            for sg in range(G):
                tap = taps[sg][layer_group[i]]
                xs[sg].append(x[sg])
                fg = jnp.dot(tap, fgp_ref[i], preferred_element_type=jnp.float32)
                fg = fg + jnp.dot(x[sg], fgc_ref[i], preferred_element_type=jnp.float32)
                fg = fg + cfg_rows[sg][:, i * 2 * Cd : (i + 1) * 2 * Cd]
                # reference gate split: gate first half, filter second
                z = (jnp.tanh(fg[:, Cd:]) * jax.nn.sigmoid(fg[:, :Cd])).astype(dtype)
                x[sg] = (x[sg] + jnp.dot(z, densew_ref[i], preferred_element_type=jnp.float32)).astype(dtype)
                zs[sg].append(z)

        for g, (d, layers) in enumerate(groups):
            pad = 128 - len(layers) * Cr
            for sg in range(G):
                pieces = [xs[sg][i] for i in layers]
                if pad:
                    pieces.append(jnp.zeros((S, pad), dtype))
                rings[g][pl.ds(sg * d + slots[g], 1)] = jnp.concatenate(
                    pieces, axis=1
                )[None]

        out_row_new = []
        next_oh = []
        for sg in range(G):
            z_all = jnp.concatenate(zs[sg], axis=1)
            h = jax.nn.relu(jnp.dot(z_all, skipw_ref[:], preferred_element_type=jnp.float32)).astype(dtype)
            h = (
                jnp.dot(h, post1_ref[:], preferred_element_type=jnp.float32)
                + cond_post_cur[pl.ds(sg * S, S)]
            )
            h = jax.nn.relu(h).astype(dtype)
            logits = jnp.dot(h, post2_ref[:], preferred_element_type=jnp.float32)

            next_tok = jnp.argmax(logits, axis=1, keepdims=True).astype(jnp.int32)
            next_oh.append((q_iota == next_tok).astype(dtype))
            out_row_new.append(
                jnp.where(lane_iota == (t % 128), next_tok, out_row[sg])
            )
        out_row = tuple(out_row_new)

        @pl.when(t % 128 == 127)
        def _():
            for sg in range(G):
                base = pl.multiple_of((t // 128) * S_total + sg * S, 8)
                out_ref[pl.ds(base, S), :] = out_row[sg]

        return cur_oh, tuple(next_oh), out_row

    jax.lax.fori_loop(
        0, total, step,
        (
            tuple(prev0_ref[pl.ds(sg * S, S)] for sg in range(G)),
            tuple(cur0_ref[pl.ds(sg * S, S)] for sg in range(G)),
            tuple(jnp.zeros((S, 128), jnp.int32) for _ in range(G)),
        ),
    )
