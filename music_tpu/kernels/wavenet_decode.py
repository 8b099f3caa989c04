"""Fully-fused WaveNet autoregressive decode — one Pallas kernel, 8 streams.

The reference's fast path is 160k Python iterations of per-layer cached
convs (wavenet/fast_generate.py:66-141).  The lax.scan rewrite
(music_tpu/models/wavenet.py:generate_tokens) already collapses that into
one XLA program (~16k samples/sec/chip); this kernel removes the remaining
per-op dispatch: the ENTIRE generation loop — 40 gated residual layers,
skip/post projections, argmax sampling, re-embedding, cache update — runs
inside a single ``pallas_call`` with every weight and the activation cache
resident in VMEM.

Shape discipline: Mosaic has no sublane broadcast and no unaligned dynamic
vector loads, so every tensor in the loop is ``[8, lanes]`` — the native
(sublane x lane) tile.  The 8 sublanes are 8 *independent decode streams*
(the reference decodes one): same latency per step, 8x the samples.

- **Cache = per-dilation ring buffers of [8, 128] tiles.**  Layers sharing
  a dilation value form a group (the shipped schedule [1,2,...,512]*4 gives
  10 groups of 4 layers x 32 ch = 128 lanes).  Group ``g`` keeps a
  ``[d_g, 8, 128]`` VMEM buffer; at step ``t`` slot ``t mod d_g`` holds
  exactly the tile from ``t - d_g`` — read it, then overwrite with the
  current activations.  Leading-dim indices address whole (8, 128) tiles,
  so the dynamic slot access is always aligned; cache traffic is O(1)
  tiles/step per group regardless of dilation.
- **Lane extraction on the MXU**: layer ``i``'s tap occupies lanes
  ``[k*Cr,(k+1)*Cr)`` of its group tile; the prev-tap weight is zero-padded
  to ``[128, 2Cd]`` so the matmul selects the lanes for free.
- **Tokens live as one-hot rows** ``[8, Q]``: embedding = one MXU matmul;
  argmax -> ``[8, 1]`` int vreg -> iota-compare back to one-hot.  No
  vector->scalar extraction, no gathers, no SMEM.
- **Priming is not in the kernel**: the cache init and boot one-hots come
  from a *parallel* conv forward over the prime.
- **Output**: a ``[8, 128]`` vreg (lane-masked insert per step) stored to
  an aligned 8-row tile of the output every 128 steps.
- **One skip GEMM**: all 40 skip projections batched as
  ``[8, L*Cd] @ [L*Cd, Cs]``.

VMEM (full config: L=40, Cr=Cd=32, Cs=512, Q=256):
cache sum(d)*8*128*4 = 4.2 MB + fg 1.4 MB + dense 0.7 MB + skip 2.6 MB +
post 1.5 MB + embeddings 0.3 MB + out 4 MB/128k  ≈ 11-14 MB < 16 MB.
The ring init lives in HBM (``pl.ANY``) and boots the cache by DMA — a
VMEM init input would double-count against the budget.  Serving depth
(``n_stream_groups``): one extra ring-cache set per group; the full-size
model fits two groups (16 f32 / 32 bf16 streams in one kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_tpu.models.wavenet import WaveNetConfig
from music_tpu.ops.conv import conv1x1, dilated_causal_conv, token_causal_conv

N_STREAMS = 8  # default stream count — the f32 (8, 128) tile
# bf16 variant: 16 streams (native bf16 (16,128) tile), single-pass MXU
# matmuls instead of multi-pass f32 — higher total throughput, tiny
# numeric differences (documented in docs/DIVERGENCES.md)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _grouping(cfg: WaveNetConfig, row_lanes: int = 128):
    """Group layers by dilation value (order of first appearance).

    Returns (groups, lane_of_layer): groups is [(dilation, [layer idx])];
    each group's activations occupy one ``row_lanes``-lane row
    (lane_of_layer[i] is layer i's offset within it).  The resident kernel
    uses the native 128-lane row; the HBM-streaming variant
    (kernels.wavenet_decode_hbm) passes a wider multiple of 128 for scaled
    models.
    """
    Cr = cfg.residual_channels
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
                f"group of {len(layers)} layers x {Cr} ch exceeds a "
                f"{row_lanes}-lane row (use the HBM-streaming kernel with a "
                f"wider row: kernels.wavenet_decode_hbm)"
            )
        for k, i in enumerate(layers):
            lane_of_layer[i] = k * Cr
    return groups, lane_of_layer


def max_stream_groups(
    cfg: WaveNetConfig,
    n_streams: int = N_STREAMS,
    dtype=jnp.float32,
    vmem_budget: int = 14 * 1024 * 1024,
    n_steps: int = 0,
) -> int:
    """Serving groups that fit VMEM next to the resident weights.

    Per-group cost: one ring-cache set (``sum(distinct dilations) *
    n_streams * 128`` elements) plus the VMEM-resident int32 token output
    tile (``round_up(n_steps, 128) * n_streams * 4`` bytes — pass the
    per-CALL step count; long decodes must be chunked by the caller, see
    generate/wavenet_generate.py).  Shared cost: the repacked weights.
    The budget leaves ~2 MB of the 16 MB for one-hots and slack.
    Returns 0 when the weights alone don't fit (use the HBM kernel).
    """
    itemsize = jnp.dtype(dtype).itemsize
    L, Cr, Cd, Cs, Q = (
        cfg.n_blocks, cfg.residual_channels, cfg.dilation_channels,
        cfg.skip_channels, cfg.quantization_channels,
    )
    ring_bytes = sum({d for d in cfg.dilations}) * n_streams * 128 * itemsize
    out_bytes = _round_up(n_steps, 128) * n_streams * 4 if n_steps else 0
    weight_bytes = (
        L * (128 * 2 * Cd + Cr * 2 * Cd + Cd * Cr)  # fgp + fgc + dense
        + L * Cd * Cs + Cs * Cs + Cs * Q            # skip + post1 + post2
        + 2 * Q * Cr                                # embeddings
    ) * itemsize
    return max(0, (vmem_budget - weight_bytes) // (ring_bytes + out_bytes))


def _decode_kernel(
    # inputs
    ring_init_hbm,   # ANY [G*sum(d_g), S, 128] — packed init tiles, DMA-booted
    cur0_ref,        # [G*S, Q] f32 — one-hot of the first input token (s_0)
    prev0_ref,       # [G*S, Q] f32 — one-hot of the last prime token
    ecur_ref,        # [Q, Cr] f32  (causal tap on the current token)
    eprev_ref,       # [Q, Cr] f32  (causal tap on the previous token)
    fgp_ref,         # [L, 128, 2*Cd] f32 — zero-padded prev-tap weights
    fgc_ref,         # [L, Cr, 2*Cd] f32 — current-tap weights
    densew_ref,      # [L, Cd, Cr] f32
    skipw_ref,       # [L*Cd, Cs] f32
    post1_ref,       # [Cs, Cs] f32
    post2_ref,       # [Cs, Q] f32
    seed_ref,        # SMEM [1] i32 — PRNG seed (categorical mode)
    # outputs
    out_ref,         # [(T//128)*G*S, 128] i32 — block b rows G*S*b.. = streams
    # scratch: one shift register per dilation group (+ boot DMA semaphore)
    *scratch,        # rings each [G*d_g, S, 128], then one DMA sem
    cfg: WaveNetConfig,
    total: int,
    n_streams: int,
    n_stream_groups: int,
    dtype,
    sample_mode: str,
    temperature: float,
):
    L = cfg.n_blocks
    Cr, Cd, Cs, Q = (
        cfg.residual_channels,
        cfg.dilation_channels,
        cfg.skip_channels,
        cfg.quantization_channels,
    )
    S = n_streams
    G = n_stream_groups  # independent serving groups: each keeps its own
    # legal [S, 128] tile + ring cache; the G dependency chains are
    # independent, so their matmuls interleave in the pipeline — total
    # throughput scales with G at slowly-growing step latency (the path
    # past the compiler's 16-stream sublane-tile ceiling)
    groups, lane_of_layer = _grouping(cfg)
    layer_group = {}
    for g, (d, layers) in enumerate(groups):
        for i in layers:
            layer_group[i] = g
    ring_base = list(np.cumsum([0] + [d for d, _ in groups[:-1]]))
    rings, boot_sem = scratch[:-1], scratch[-1]

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
    if sample_mode == "categorical":
        pltpu.prng_seed(seed_ref[0])

    def sample(logits):
        """Greedy argmax, or Gumbel-max categorical with temperature using
        the on-chip PRNG (uniforms via the mantissa bitcast trick)."""
        if sample_mode == "categorical":
            bits = pltpu.bitcast(pltpu.prng_random_bits((S, Q)), jnp.uint32)
            mant = jnp.bitwise_or(
                jnp.right_shift(bits, jnp.uint32(9)), jnp.uint32(0x3F800000)
            )
            u = pltpu.bitcast(mant, jnp.float32) - 1.0  # [0, 1)
            gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
            logits = logits / temperature + gumbel
        return jnp.argmax(logits, axis=1, keepdims=True).astype(jnp.int32)

    def step(t, carry):
        prev_oh, cur_oh, out_row = carry  # tuples of G per-group arrays

        x = [
            (
                jnp.dot(cur_oh[sg], ecur_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(prev_oh[sg], eprev_ref[:], preferred_element_type=jnp.float32)
            ).astype(dtype)
            for sg in range(G)
        ]

        slots = []
        for g, (d, layers) in enumerate(groups):
            slots.append(t % d if d > 1 else 0)
        taps = [
            [rings[g][pl.ds(sg * d + slots[g], 1)][0] for g, (d, _) in enumerate(groups)]
            for sg in range(G)
        ]  # [G][dilation group] -> [S, 128] = x_i[t - d]

        xs = [[] for _ in range(G)]
        zs = [[] for _ in range(G)]
        for i in range(L):
            for sg in range(G):
                tap = taps[sg][layer_group[i]]
                xs[sg].append(x[sg])
                # prev-tap via zero-padded weights: the matmul extracts the lanes
                fg = jnp.dot(tap, fgp_ref[i], preferred_element_type=jnp.float32)
                fg = fg + jnp.dot(x[sg], fgc_ref[i], preferred_element_type=jnp.float32)
                z = (jnp.tanh(fg[:, :Cd]) * jax.nn.sigmoid(fg[:, Cd:])).astype(dtype)
                x[sg] = (x[sg] + jnp.dot(z, densew_ref[i], preferred_element_type=jnp.float32)).astype(dtype)
                zs[sg].append(z)

        # overwrite each group's slot with the current activations
        for g, (d, layers) in enumerate(groups):
            pad = 128 - len(layers) * Cr
            for sg in range(G):
                pieces = [xs[sg][i] for i in layers]
                if pad:
                    pieces.append(jnp.zeros((S, pad), dtype))
                new_tile = jnp.concatenate(pieces, axis=1)  # [S, 128]
                rings[g][pl.ds(sg * d + slots[g], 1)] = new_tile[None]

        out_row_new = []
        next_oh = []
        for sg in range(G):
            z_all = jnp.concatenate(zs[sg], axis=1)  # [S, L*Cd] (layer-major)
            h = jax.nn.relu(
                jnp.dot(z_all, skipw_ref[:], preferred_element_type=jnp.float32)
            ).astype(dtype)
            h = jax.nn.relu(
                jnp.dot(h, post1_ref[:], preferred_element_type=jnp.float32)
            ).astype(dtype)
            logits = jnp.dot(h, post2_ref[:], preferred_element_type=jnp.float32)

            next_tok = sample(logits)  # [S, 1]
            next_oh.append((q_iota == next_tok).astype(dtype))  # [S, Q]
            out_row_new.append(
                jnp.where(lane_iota == (t % 128), next_tok, out_row[sg])
            )
        out_row = tuple(out_row_new)

        @pl.when(t % 128 == 127)
        def _():
            for sg in range(G):
                base = pl.multiple_of((t // 128) * (G * S) + sg * S, 8)
                out_ref[pl.ds(base, S), :] = out_row[sg]

        return cur_oh, tuple(next_oh), out_row

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


def _build_kernel_weights(params: dict, cfg: WaveNetConfig, dtype=jnp.float32):
    """Repack the model pytree into the kernel's layouts."""
    L, Cr, Cd, Cs = (
        cfg.n_blocks,
        cfg.residual_channels,
        cfg.dilation_channels,
        cfg.skip_channels,
    )
    _, lane_of_layer = _grouping(cfg)
    # zero-padded prev-tap weights: rows [k*Cr,(k+1)*Cr) of layer i's group
    # row carry fg[i, 0]; everything else 0 so the matmul masks the lanes
    fgp = jnp.zeros((L, 128, 2 * Cd), jnp.float32)
    for i in range(L):
        off = lane_of_layer[i]
        fgp = fgp.at[i, off : off + Cr].set(params["fg"][i, 0])
    w = {
        "ecur": params["causal"][1],   # [Q, Cr] — tap on current token
        "eprev": params["causal"][0],  # [Q, Cr] — tap on previous token
        "fgp": fgp,
        "fgc": params["fg"][:, 1],     # [L, Cr, 2Cd]
        "densew": params["dense"],
        "skipw": params["skip"].reshape(L * Cd, Cs),
        "post1": params["post1"],
        "post2": params["post2"],
    }
    return {k: v.astype(dtype) for k, v in w.items()}


def _collect_prime_state(params: dict, prime: jax.Array, cfg: WaveNetConfig,
                         row_lanes: int = 128, sample_mode: str = "argmax",
                         temperature: float = 1.0, key=None):
    """Parallel prime: run the conv forward over the prime tokens, extract
    the shift-register init tiles + the boot one-hots.

    Invariant entering kernel step 0: group ``g``'s slot ``s`` holds layer
    inputs at absolute time ``P - d_g + s`` (P = prime length), so step
    ``t``'s read of slot ``t mod d_g`` yields time ``P + t - d_g``.
    Requires ``P >= receptive_field + max_dilation``; batch = stream count.

    ``sample_mode``/``temperature``/``key``: how to draw the FIRST token
    s_0 (it is produced here, host-side, not by the kernel's sampler) —
    categorical callers must pass their mode so chunk-boundary tokens of a
    chunked decode aren't silently argmax.
    """
    L, Cr, Q = cfg.n_blocks, cfg.residual_channels, cfg.quantization_channels
    D_max = max(cfg.dilations)
    P = prime.shape[1]
    need = cfg.receptive_field + D_max
    if P < need:
        raise ValueError(f"prime length {P} < receptive_field + max_dilation = {need}")
    groups, lane_of_layer = _grouping(cfg, row_lanes)

    # collect per-layer residual streams (valid convs, shrinking lengths)
    x = token_causal_conv(prime, params["causal"])  # [8, P-1, Cr], abs offset 1
    streams = [x]
    offsets = [1]
    for i, d in enumerate(cfg.dilations):
        fg = dilated_causal_conv(x, params["fg"][i], dilation=d)
        z = jnp.tanh(fg[..., : cfg.dilation_channels]) * jax.nn.sigmoid(
            fg[..., cfg.dilation_channels :]
        )
        x = conv1x1(z, params["dense"][i]) + x[:, -fg.shape[1]:, :]
        streams.append(x)
        offsets.append(offsets[-1] + d)

    S = prime.shape[0]
    total_tiles = sum(d for d, _ in groups)
    init = jnp.zeros((total_tiles, S, row_lanes), jnp.float32)
    base = 0
    for g, (d, layers) in enumerate(groups):
        for i in layers:
            s, o = streams[i], offsets[i]
            # slot k (k=0..d-1) <- abs time P - d + k
            seg = s[:, P - d - o : P - o, :]               # [S, d, Cr]
            seg = jnp.swapaxes(seg, 0, 1)                  # [d, S, Cr]
            lane = lane_of_layer[i]
            init = init.at[base : base + d, :, lane : lane + Cr].set(seg)
        base += d

    # first sampled token s_0 from the last receptive field of the prime
    from music_tpu.models.wavenet import forward

    logits = forward(params, prime[:, -cfg.receptive_field :], cfg)  # [8, 1, Q]
    if sample_mode == "categorical" and key is not None:
        s0 = jax.random.categorical(
            key, logits[:, -1] / temperature, axis=-1
        ).astype(jnp.int32)
    else:
        s0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)    # [8]
    cur0 = jax.nn.one_hot(s0, Q, dtype=jnp.float32)
    prev0 = jax.nn.one_hot(prime[:, -1], Q, dtype=jnp.float32)
    return init, cur0, prev0, s0


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "interpret", "n_streams", "dtype", "sample_mode",
        "temperature", "n_stream_groups",
    ),
)
def generate_tokens_fused(
    params: dict,
    prime: jax.Array,
    *,
    cfg: WaveNetConfig,
    n_steps: int,
    interpret: bool = False,
    n_streams: int = N_STREAMS,
    n_stream_groups: int = 1,
    dtype=jnp.float32,
    sample_mode: str = "argmax",
    temperature: float = 1.0,
    seed: int = 0,
) -> jax.Array:
    """Generate ``n_steps`` codes per stream (greedy) after priming.

    ``prime``: ``[B, P]`` int codes with ``B <= n_stream_groups*n_streams``;
    rows are independent streams (padded internally).  Returns
    ``[B, n_steps]``.  ``dtype=jnp.bfloat16`` with ``n_streams=16`` uses
    the native bf16 tile and single-pass MXU matmuls (small numeric
    differences vs f32).  ``sample_mode="categorical"`` draws Gumbel-max
    samples at ``temperature`` using the on-chip PRNG (TPU only — no
    interpret-mode lowering exists for the PRNG primitives).

    ``n_stream_groups=G`` serves ``G * n_streams`` independent streams
    from one kernel: each group keeps its own legal sublane tile and ring
    cache (one extra ring-cache set of VMEM per group — the full-size
    model fits G=2), and the G independent dependency chains interleave,
    so total throughput grows far faster than step latency.

    Semantics match :func:`music_tpu.models.wavenet.generate_tokens` with
    ``sample_mode='argmax'`` (verified in tests/test_pallas_decode.py).
    """
    if cfg.filter_width != 2:
        raise NotImplementedError("fused decode assumes filter_width=2")
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
    groups, _ = _grouping(cfg)

    ring0, cur0, prev0, s0 = _collect_prime_state(
        params, prime, cfg, sample_mode=sample_mode, temperature=temperature,
        key=jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32)),
    )
    if G > 1:
        # repack [tiles, G*S, 128] -> [G*tiles, S, 128]: group sg's tiles first
        n_tiles = ring0.shape[0]
        ring0 = (
            ring0.reshape(n_tiles, G, S, 128)
            .swapaxes(0, 1)
            .reshape(G * n_tiles, S, 128)
        )
    ring0, cur0, prev0 = ring0.astype(dtype), cur0.astype(dtype), prev0.astype(dtype)
    w = _build_kernel_weights(params, cfg, dtype)

    total = _round_up(n_steps, 128)
    kernel = functools.partial(
        _decode_kernel, cfg=cfg, total=total, n_streams=S,
        n_stream_groups=G, dtype=dtype,
        sample_mode=sample_mode, temperature=temperature,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((total // 128) * S_total, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G * d, S, 128), dtype) for d, _ in groups
        ]
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(
        ring0, cur0, prev0,
        w["ecur"], w["eprev"], w["fgp"], w["fgc"], w["densew"], w["skipw"],
        w["post1"], w["post2"],
        jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)),  # trace-safe (seed may be a jit operand)
    )
    # out rows: block b holds streams at times [128b, 128(b+1))
    toks = out.reshape(total // 128, S_total, 128)
    toks = jnp.swapaxes(toks, 0, 1).reshape(S_total, total)[:, :n_steps]
    # the kernel consumes s_0 at step 0 and emits s_1..; the generated stream
    # starts at s_0
    return jnp.concatenate([s0[:, None], toks[:, : n_steps - 1]], axis=1)[:B]
