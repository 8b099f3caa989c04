"""WaveNet audio generation entry point.

Parity surface: wavenet/fast_generate.py:144-186 —
``generate(model_path, ..., start_piece, sr, duration)`` loads a trained
model, seeds with a receptive field of µ-law silence (code 128,
fast_generate.py:158-161), autoregressively decodes ``duration * sr``
samples, µ-law-decodes (bit-exact — music_tpu/ops/mulaw.py) and writes a
16-bit PCM wav.

The decode itself is :func:`music_tpu.models.wavenet.generate_tokens` — one
compiled ``lax.scan`` instead of 160k Python steps (fast_generate.py:162-172).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.data import wavio
from music_tpu.models import wavenet as wn
from music_tpu.ops.mulaw import mu_law_decode


STEPS_PER_CALL = 16_384
"""Per-kernel-call decode step cap.

The fused kernels keep their int32 token output whole-array VMEM-resident
(no grid), so output bytes grow as ``4 * round_up(n_steps, 128) * streams``
per call — a 10 s decode of 32 streams would alone need ~20.5 MB of the
16 MB VMEM.  Long decodes are therefore split into <=STEPS_PER_CALL-step
calls, each re-primed from the previous call's tail (16,384 steps x 16
streams x 4 B = 1 MB/group — the budget the max_stream_groups helpers
charge via their ``n_steps`` argument)."""


_JIT_CACHE: dict = {}


def jit_fused(fn, **static_kw):
    """jit-wrap a fused decode wrapper, everything but (params, rows, and
    the dynamic scalars) static.

    The wrapper functions run EAGERLY when called directly: the parallel
    prime pass + weight repack is dozens of XLA ops, and the axon relay
    charges ~30-40 ms dispatch PER OP — which made a chunked 10 s serving
    request ~30x slower than its device time.  The jitted form is ONE
    dispatch per chunk; per-chunk values (``seed``, the AE ``pos_offset``)
    ride in the ``dyn`` dict as traced scalars so chunks share one
    executable.  Cached per (fn, static kwargs) — reuse across calls and
    sessions."""
    key = (fn, frozenset(static_kw.items()))
    jitted = _JIT_CACHE.get(key)
    if jitted is None:

        def call(params, arrays, dyn):
            return fn(params, *arrays, **static_kw, **dyn)

        jitted = _JIT_CACHE[key] = jax.jit(call)
    return jitted


def _chunked_fused(fused, params, rows, *, cfg, n_steps, seed=None,
                   step_chunk=STEPS_PER_CALL, chunk_kw=None, **kw):
    """Run a fused decode kernel in <=step_chunk-step calls, re-priming each
    call with the previous tail so the VMEM output tile stays bounded.

    ``seed`` may be a traced scalar (per-chunk offsets keep PRNG streams
    distinct) or None for kernels without a sampler seed.  ``chunk_kw``:
    optional ``steps_done -> dict`` of per-chunk DYNAMIC kwargs (the AE
    path passes ``pos_offset`` so the frame conditioning stays on the
    utterance clock); values must be jit-traceable scalars.  Each chunk
    runs as ONE jitted dispatch (see :func:`jit_fused`).
    """
    prime_len = cfg.receptive_field + max(cfg.dilations)
    outs = []
    done = 0
    while done < n_steps:
        k = min(n_steps - done, step_chunk)
        dyn = {key: jnp.asarray(v) for key, v in (chunk_kw(done) or {}).items()} \
            if chunk_kw else {}
        if seed is not None:
            s_off = seed + 7919 * len(outs)
            if isinstance(s_off, (int, np.integer)):
                s_off %= 2**31  # Python ints overflow int32 conversion;
                # traced seeds are already int32 and wrap natively
            dyn["seed"] = jnp.asarray(s_off, jnp.int32)
        call = jit_fused(fused, cfg=cfg, n_steps=k, **kw)
        codes = call(params, (rows,), dyn)
        outs.append(codes)
        done += k
        if done < n_steps:
            rows = jnp.concatenate([rows, codes], axis=1)[:, -prime_len:]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _fused_decode(params, prime, cfg, n_steps, on_tpu, sample_mode, temperature, seed):
    """Pick the right Pallas kernel for this config: the fully-resident one
    when the weights fit VMEM and every dilation group fits one 128-lane
    row, else the HBM-streaming variant (kernels/wavenet_decode_hbm.py).
    Returns None when neither supports the config (caller falls back to the
    lax.scan path)."""
    from music_tpu.kernels import wavenet_decode, wavenet_decode_hbm

    weight_bytes = sum(
        int(np.prod(v.shape)) * 4 for v in jax.tree_util.tree_leaves(params)
    )
    try:
        wavenet_decode._grouping(cfg)
        resident_ok = weight_bytes < 12e6  # leave room for rings + output
    except NotImplementedError:
        resident_ok = False
    fn = (
        wavenet_decode.generate_tokens_fused
        if resident_ok
        else wavenet_decode_hbm.generate_tokens_fused_hbm
    )
    try:
        return _chunked_fused(
            fn, params, prime, cfg=cfg, n_steps=n_steps, interpret=not on_tpu,
            sample_mode=sample_mode, temperature=temperature, seed=seed,
        )
    except NotImplementedError:
        return None


def sharded_rows_program(mesh, params, body):
    """Serving-mesh scaffolding shared by :func:`generate_batch` and
    generate/serving.DecodeSession: validate a data-only mesh and wrap
    ``body(params, rows, seed_arr)`` in a jitted ``shard_map`` — rows
    shard over ``data``, params and the seed replicate (bodies offset
    their PRNG stream by ``axis_index``)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if "data" not in mesh.axis_names:
        raise ValueError("serving mesh needs a 'data' axis")
    if int(np.prod([s for a, s in mesh.shape.items() if a != "data"])) != 1:
        raise ValueError("serving mesh must be data-only (other axes = 1)")
    pspecs = jax.tree_util.tree_map(lambda _: P(), params)
    # check_vma=False: decode bodies are pure per-device compute (no
    # collectives), and jax 0.9's vma checker rejects pallas_call
    # out_shapes inside shard_map (ShapeDtypeStruct has no vma) — the
    # fused kernels could not otherwise run under a serving mesh
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P("data", None), P()),
        out_specs=P("data", None),
        check_vma=False,
    ))


def plan_fused_serving(cfg, S, dtype, call_steps, n):
    """Pick the fused serving kernel, tile height and group cap for ``n``
    streams (``S``: the native tile height the resident/HBM plans use).

    Returns ``(fused_fn, S_used, g_max, rings_in_hbm)``; ``fused_fn is
    None`` means no Pallas kernel supports the config (callers fall back
    to the batched ``lax.scan`` path).  Preference order: resident kernel
    (lowest step latency) when weights + rings + output fit VMEM, else
    the HBM-streaming kernel; when ``n`` outgrows the VMEM-ring group
    caps, upgrade to HBM ring state — large-dilation ring slots live in
    HBM (one tile in+out per group per step), lifting the serving-group
    ceiling by ~30-60x.  The rings plan also WIDENS the tile
    (:func:`...wavenet_decode_hbm.serving_stream_width` — the round-5
    shape A/B: wide tiles batch the per-layer matmuls across streams,
    full-model 128 streams 1.27M -> 2.58M samples/s), clamped to the
    padded request so small ``n`` doesn't pay for empty rows."""
    from music_tpu.kernels import wavenet_decode, wavenet_decode_hbm

    fused, g_max, rings_in_hbm = None, 1, False
    if cfg.filter_width != 2:
        # both fused kernels assume filter_width=2 (their wrappers raise
        # at call time — the plan must route such configs to the scan path)
        return fused, S, g_max, rings_in_hbm
    res_g = hbm_g = 0
    try:
        wavenet_decode._grouping(cfg)
        res_g = wavenet_decode.max_stream_groups(cfg, S, dtype, n_steps=call_steps)
    except NotImplementedError:
        pass
    try:
        wavenet_decode_hbm._grouping(cfg, wavenet_decode_hbm._row_lanes(cfg))
        if (
            wavenet_decode_hbm._post_block(cfg) == 128
            and cfg.dilation_channels % 8 == 0
            and not cfg.use_bias
        ):
            hbm_g = wavenet_decode_hbm.max_stream_groups(
                cfg, S, dtype, n_steps=call_steps
            )
    except NotImplementedError:
        pass
    if res_g >= 1:
        fused, g_max = wavenet_decode.generate_tokens_fused, res_g
    elif hbm_g >= 1:
        fused, g_max = wavenet_decode_hbm.generate_tokens_fused_hbm, hbm_g
    if fused is not None and n > S * g_max and hbm_g >= 1:
        S_wide = min(
            wavenet_decode_hbm.serving_stream_width(cfg, dtype),
            max(S, -(-n // S) * S),  # no wider than the padded request
        )
        # round-5b composed-capacity probes (composed_capacity_r5b.json +
        # wide192_gate_r5.json): one S192 tile steps at 64-69 µs on the
        # full model where a second 128-wide group costs 88-124 µs
        # (1.4-1.9x across relay draws), and S=160 hits a Mosaic tiling
        # pathology (116 µs — never emit it); so a request that would
        # otherwise pay S128 x G2 (128 < n <= 192) widens to one 192
        # tile instead.  Trained-margin hardware gate (all agreements
        # 1.000000): benchmarks._hw_wide192_check.
        if S_wide == 128 and 128 < n <= 192 and (
            wavenet_decode_hbm.max_stream_groups_hbm_rings(
                cfg, 192, dtype, n_steps=call_steps
            )
            >= 1
        ):
            S_wide = 192
        hbmr_g = wavenet_decode_hbm.max_stream_groups_hbm_rings(
            cfg, S_wide, dtype, n_steps=call_steps
        )
        if S_wide * hbmr_g > S * g_max:
            return (
                wavenet_decode_hbm.generate_tokens_fused_hbm,
                S_wide, hbmr_g, True,
            )
    return fused, S, g_max, rings_in_hbm


def generate(
    *,
    cfg: wn.WaveNetConfig,
    params=None,
    checkpoint_dir: str | Path | None = None,
    out_path: str | Path,
    start_piece: np.ndarray | None = None,
    sr: int = 16000,
    duration: float = 10.0,
    sample_mode: str = "argmax",
    temperature: float = 1.0,
    seed: int = 0,
    backend: str = "fused",
) -> np.ndarray:
    """Generate ``duration`` seconds of audio and write it to ``out_path``.

    ``start_piece``: optional µ-law codes to prime with; defaults to a full
    receptive field (+ max dilation) of silence (code Q//2 = 128 for Q=256).
    ``backend``: ``"fused"`` (single Pallas kernel, argmax only — the fast
    path) or ``"scan"`` (lax.scan; supports categorical sampling).
    """
    if params is None:
        if checkpoint_dir is None:
            raise ValueError("need params or checkpoint_dir")
        example = wn.init_params(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.restore_subtree(checkpoint_dir, example, prefix=".params")

    prime_len = cfg.receptive_field + max(cfg.dilations)
    if start_piece is None:
        start_piece = np.full(
            (prime_len,), cfg.quantization_channels // 2, np.int32
        )
    prime = jnp.asarray(start_piece, jnp.int32)[None, :]

    n_steps = int(duration * sr)
    on_tpu = jax.default_backend() == "tpu"
    # fused categorical needs the on-chip PRNG (TPU only)
    fused_ok = sample_mode == "argmax" or (sample_mode == "categorical" and on_tpu)
    if backend == "fused" and fused_ok and prime.shape[1] >= prime_len:
        codes = _fused_decode(
            params, prime, cfg, n_steps, on_tpu, sample_mode, temperature, seed
        )
        if codes is None:  # no fused kernel fits this config -> scan path
            backend = "scan"
    if backend != "fused" or not fused_ok or prime.shape[1] < prime_len:
        codes = wn.generate_tokens(
            params,
            prime,
            jax.random.PRNGKey(seed),
            cfg=cfg,
            n_steps=n_steps,
            prime_len=prime.shape[1],
            sample_mode=sample_mode,
            temperature=temperature,
        )
    audio = np.asarray(mu_law_decode(codes[0], cfg.quantization_channels))
    wavio.write_wav(out_path, audio, sr)
    return audio


def generate_batch(
    *,
    cfg: wn.WaveNetConfig,
    params=None,
    checkpoint_dir: str | Path | None = None,
    n: int,
    out_dir: str | Path | None = None,
    start_pieces: np.ndarray | None = None,
    sr: int = 16000,
    duration: float = 10.0,
    sample_mode: str = "categorical",
    temperature: float = 1.0,
    seed: int = 0,
    dtype=jnp.bfloat16,
    mesh=None,
) -> np.ndarray:
    """Serve ``n`` independent decode streams at once; returns ``[n, T]`` audio.

    The TPU-native serving path the reference never had (its
    fast_generate.py decodes one stream in 160k Python steps): streams are
    packed into as few fused-kernel launches as possible — ``n_streams``
    per sublane tile (8 f32 / 16 bf16) times ``n_stream_groups`` per
    kernel, bounded by what the ring caches allow in VMEM
    (:func:`music_tpu.kernels.wavenet_decode_hbm.max_stream_groups`); the
    HBM-streaming kernel shares one weight stream across all groups.  Off
    TPU, the whole batch runs as one vmapped ``lax.scan`` program.

    ``start_pieces``: optional ``[n, P]`` µ-law codes (P >= receptive_field
    + max dilation); defaults to silence.  With ``sample_mode="categorical"``
    (default — argmax streams from identical primes would be identical),
    stream i draws from PRNG stream ``seed + chunk``.  When ``out_dir`` is
    given, writes ``gen_000.wav ...``.  ``dtype`` defaults to bfloat16 —
    the serving tile carries 16 streams at the same step latency as 8
    (tiny numeric differences vs f32, docs/DIVERGENCES.md); pass
    ``jnp.float32`` for the bit-identical-to-f32-scan path.

    ``mesh``: a Mesh with a ``data`` axis scales serving out over chips —
    rows are sharded over the axis and every device runs its own fused
    kernel (or scan program) instance via ``shard_map``, with per-device
    PRNG streams from ``axis_index``.  Chip count multiplies the
    single-chip serving throughput; no cross-chip communication exists in
    the decode.  Axes other than ``data`` must have size 1.
    """
    from music_tpu.kernels import wavenet_decode, wavenet_decode_hbm

    if params is None:
        if checkpoint_dir is None:
            raise ValueError("need params or checkpoint_dir")
        example = wn.init_params(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.restore_subtree(checkpoint_dir, example, prefix=".params")

    prime_len = cfg.receptive_field + max(cfg.dilations)
    if start_pieces is None:
        start_pieces = np.full(
            (n, prime_len), cfg.quantization_channels // 2, np.int32
        )
    prime = jnp.asarray(start_pieces, jnp.int32)
    if prime.ndim != 2 or prime.shape[0] != n or prime.shape[1] < prime_len:
        raise ValueError(f"start_pieces must be [n={n}, >={prime_len}]")

    n_steps = int(duration * sr)
    on_tpu = jax.default_backend() == "tpu"
    S = 16 if jnp.dtype(dtype) == jnp.bfloat16 else wavenet_decode.N_STREAMS

    # plan: resident multi-group when the weights fit VMEM (lowest step
    # latency), else HBM-streaming multi-group, else one batched scan
    # program (off-TPU the scan path always wins: interpret-mode Pallas
    # would be slower)
    fused, g_max, rings_in_hbm = None, 1, False
    # long decodes run as <=STEPS_PER_CALL-step chunked calls, so the
    # VMEM output budget is charged per CALL, not per request
    call_steps = min(n_steps, STEPS_PER_CALL)
    if on_tpu:
        fused, S, g_max, rings_in_hbm = plan_fused_serving(
            cfg, S, dtype, call_steps, n
        )

    def decode_rows(p, rows, seed_scalar):
        """Decode one device's rows; seed may be a traced scalar."""
        if fused is not None:
            extra = (
                {"rings_in_hbm": True}
                if rings_in_hbm
                and fused is wavenet_decode_hbm.generate_tokens_fused_hbm
                else {}
            )
            return _chunked_fused(
                fused, p, rows, cfg=cfg, n_steps=n_steps, n_streams=S,
                n_stream_groups=-(-rows.shape[0] // S), dtype=dtype,
                sample_mode=sample_mode, temperature=temperature,
                seed=seed_scalar, **extra,
            )
        return wn.generate_tokens(
            p, rows, jax.random.PRNGKey(seed_scalar), cfg=cfg,
            n_steps=n_steps, prime_len=rows.shape[1],
            sample_mode=sample_mode, temperature=temperature,
        )

    D = mesh.shape.get("data", 1) if mesh is not None else 1
    multiproc = jax.process_count() > 1
    codes_parts = []
    if D > 1:
        # scale out over chips: rows sharded over `data`, params
        # replicated, one kernel instance per device, per-device PRNG.
        # Multi-HOST meshes work the same way: each host transfers only
        # its own prime rows (multihost.put_global_batch) and gets back
        # its own audio rows — rows beyond this host's shard come back
        # as zeros (see below).
        from music_tpu.parallel import multihost
        from jax.sharding import NamedSharding, PartitionSpec as P_

        if fused is not None:
            # clamp to what n actually needs (whole S-row groups) — the
            # rings-upgraded g_max can far exceed the request
            need_per_dev = -(-n // D)
            dev_cap = min(S * g_max, -(-need_per_dev // S) * S)
        else:
            dev_cap = -(-n // D)
        per_call = D * dev_cap

        def body(p, rows, seed_arr):
            idx = jax.lax.axis_index("data")
            return decode_rows(p, rows, seed_arr[0] + idx)

        if multiproc:
            params = jax.device_put(params, NamedSharding(mesh, P_()))
        sharded = sharded_rows_program(mesh, params, body)
        for c, lo in enumerate(range(0, n, per_call)):
            chunk = np.asarray(prime[lo : lo + per_call])
            pad = per_call - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.tile(chunk[-1:], (pad, 1))], axis=0
                )
            seed_arr = jnp.asarray([(seed * 100_003 + c * D) % 2**31], jnp.int32)
            codes_parts.append(
                sharded(params, multihost.put_global_batch(mesh, chunk), seed_arr)
            )
    elif fused is None:
        codes_parts.append(decode_rows(params, prime, seed))
    else:
        per_call = S * g_max
        for c, lo in enumerate(range(0, n, per_call)):
            codes_parts.append(
                decode_rows(params, prime[lo : lo + per_call], seed + c)
            )

    if multiproc and D > 1:
        # cross-host outputs are not fully addressable: assemble this
        # host's rows locally, zero-fill the rest, and remember which
        # global rows this host actually holds (each per_call chunk is
        # data-sharded separately, so held rows interleave across chunks)
        rows_np, held = [], []
        for pi, part in enumerate(codes_parts):
            local = np.zeros(part.shape, np.int32)
            for shard in part.addressable_shards:
                local[shard.index] = np.asarray(shard.data)
                held.extend(
                    pi * per_call + r
                    for r in range(*shard.index[0].indices(part.shape[0]))
                )
            rows_np.append(local)
        codes = np.concatenate(rows_np, axis=0)[:n]
        mine = sorted(r for r in set(held) if r < n)
    else:
        codes = jnp.concatenate(codes_parts, axis=0)[:n]
        mine = None
    audio = np.asarray(mu_law_decode(codes, cfg.quantization_channels))
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in (range(n) if mine is None else mine):
            wavio.write_wav(out_dir / f"gen_{i:03d}.wav", audio[i], sr)
    return audio
