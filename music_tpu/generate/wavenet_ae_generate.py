"""WaveNet-autoencoder generation: encode a source clip, decode a
reconstruction autoregressively, write a wav.

Parity surface: wavenet_autoencoder/generate.py (whose naive loop does a
full receptive-field forward per sample and has import/typing bugs —
SURVEY.md §2.5); here the decoder reuses the cached ring-buffer decode
with per-frame conditioning biases (models/wavenet_ae.generate_tokens).
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.data import wavio
from music_tpu.data.audio import mu_law_encode_np
from music_tpu.models import wavenet_ae as ae
from music_tpu.ops.mulaw import mu_law_decode


@functools.lru_cache(maxsize=None)
def _jit_encode(cfg: ae.WaveNetAEConfig):
    """Jitted encoder per config.  ``ae.encode`` called eagerly is ~30
    conv ops dispatched one by one — minutes through the relay for a
    serving batch; jitted it is one dispatch."""
    return jax.jit(lambda p, t: ae.encode(p, t, cfg))


def plan_ae_serving(cfg, params, n_rows: int, dtype, call_steps: int,
                    kernel: str = "auto"):
    """Pick the conditioned serving kernel for ``n_rows`` streams at
    ``call_steps``-step calls (the AE counterpart of
    wavenet_generate.plan_fused_serving; shared by AEDecodeSession and
    the mesh path of :func:`generate_batch`).

    Returns ``(fused_fn, rows, extra)``: the kernel callable, the row
    count it launches (whole 8-stream groups), and its static kwargs
    (``n_stream_groups`` for either kernel / ``rings_in_hbm`` for the HBM
    kernel).  Preference: resident kernel (lowest step latency) for as
    many interleaved stream groups as fit VMEM next to the weights on
    VMEM-sized decoders, else the HBM-streaming kernel, upgrading to
    ``rings_in_hbm`` past the VMEM-ring group cap.  ``kernel``: "auto",
    or pin "hbm" (operators trading step latency for headroom; also the
    CI hook covering the streaming path on small test configs).  Raises
    ``NotImplementedError`` when nothing fits."""
    from music_tpu.kernels import wavenet_ae_decode as res_k
    from music_tpu.kernels import wavenet_ae_decode_hbm as hbm_k

    if kernel not in ("auto", "hbm"):
        raise ValueError(f"kernel must be 'auto' or 'hbm', got {kernel!r}")
    # native sublane tile height: 16 rows bf16 / 8 rows f32 — bf16 packs
    # 2x the streams per tile AND halves the streamed-weight bytes (the
    # same tiling rule as the WaveNet kernels, CLAUDE.md Mosaic notes)
    S = 16 if jnp.dtype(dtype) == jnp.bfloat16 else res_k.N_STREAMS
    base = {"n_streams": S} if S != res_k.N_STREAMS else {}
    G_need = -(-n_rows // S)
    # NO crude model-size gate here: the resident budget is computed
    # exactly by max_stream_groups from the DECODER-KERNEL weights at the
    # compute itemsize (the model's 12 MB f32 pytree includes the encoder
    # and the cond projections, which never enter the decode kernel — at
    # bf16 the reference-size AE's kernel weights are ~3 MB and fit VMEM
    # outright, eliminating the weight stream entirely for 16 streams)
    if kernel == "auto":
        try:
            res_k._grouping(cfg)  # raises when a ring row exceeds 128 lanes
            Fc = frame_window_width(
                cfg.receptive_field + max(cfg.dilations), call_steps,
                cfg.en_pool_kernel_size,
            )
            res_g = res_k.max_stream_groups(
                cfg, dtype, n_steps=call_steps, n_frames=Fc, n_streams=S
            )
            if res_g >= max(G_need, 1):
                extra = dict(base)
                if G_need > 1:
                    extra["n_stream_groups"] = G_need
                return res_k.generate_tokens_fused, max(G_need, 1) * S, extra
        except NotImplementedError:
            pass
    extra = dict(base)
    g_cap = hbm_k.max_stream_groups(cfg, dtype, n_steps=call_steps, n_streams=S)
    if G_need > 1:
        # consider the WIDE-tile HBM-rings plan whenever the request
        # spans multiple native tiles (round-5 stream-shape A/B: the
        # marginal group cost is small-matmul sublane underutilization;
        # the AE optimum is S·W ≈ 8k lanes — reference-size AE at 32
        # streams S16xG2 740k -> S32xG1+rings 850k samples/s, see
        # wavenet_ae_decode_hbm.serving_stream_width), clamped to the
        # padded request so small n doesn't pay for empty rows
        S_wide = min(
            hbm_k.serving_stream_width(cfg, dtype),
            max(S, -(-n_rows // S) * S),
        )
        g_rings = hbm_k.max_stream_groups_hbm_rings(
            cfg, dtype, n_steps=call_steps, n_streams=S_wide
        ) if S_wide > S else 0
        # adopt when it serves at least as many rows per launch as the
        # native no-rings plan (or the whole request)
        if g_rings >= 1 and S_wide * g_rings >= min(
            n_rows, S * max(g_cap, 1)
        ):
            extra["rings_in_hbm"] = True
            extra["n_streams"] = S = S_wide
            g_cap = g_rings
        elif G_need > g_cap:
            # wide tile doesn't fit/win — classic rings upgrade at native S
            g_rings = hbm_k.max_stream_groups_hbm_rings(
                cfg, dtype, n_steps=call_steps, n_streams=S
            )
            if g_rings > g_cap:
                extra["rings_in_hbm"] = True
                g_cap = g_rings
    if g_cap < 1:
        raise NotImplementedError(
            "no AE serving group fits VMEM for this config"
        )
    G = min(-(-n_rows // S), g_cap)
    extra["n_stream_groups"] = G
    return hbm_k.generate_tokens_fused_hbm, G * S, extra


def frame_window_width(prime_len: int, steps: int, pool: int) -> int:
    """Encoding frames covering a prime + one decode call, plus clamp
    slack — shared by the chunked decode and AEDecodeSession."""
    return -(-(prime_len + steps) // pool) + 2


def frame_window(clock: int, n_frames: int, width: int, pool: int):
    """Window start ``f0`` and the rebased step-0 offset for a decode
    whose prime starts at absolute utterance time ``clock``, given an
    ``n_frames``-frame table and a fixed ``width``-frame window."""
    f0 = max(0, min(clock // pool, n_frames - width))
    return f0, clock - f0 * pool


def _sliced_ae_fused(params, encoding, ctx, *, fused, cfg, Fc, n_steps,
                     f0, pos_offset, **kw):
    """Fixed-width (``Fc``) frame slice at traced offset ``f0``, then the
    conditioned fused decode — one jit-stable callable for all chunks."""
    enc = jax.lax.dynamic_slice_in_dim(encoding, f0, Fc, axis=1)
    return fused(params, enc, ctx, cfg=cfg, n_steps=n_steps,
                 pos_offset=pos_offset, **kw)


def _chunked_ae_fused(fused, params, encoding, ctx, *, cfg, n_steps,
                      slice_frames: bool = True, step_chunk: int | None = None,
                      **kw):
    """Chunked conditioned decode with bounded per-call footprint.

    Like wavenet_generate._chunked_fused (tail re-prime every
    STEPS_PER_CALL steps — the int32 token output is VMEM-resident), plus
    the AE-specific piece: each chunk receives a FIXED-width slice of the
    encoding frames covering its prime + steps, with ``pos_offset``
    rebased so the kernel's frame clock stays aligned.  The resident
    kernel's conditioning tables are VMEM inputs that grow with utterance
    length (~30 MB for 10 s at pool 512) — slicing bounds them; the
    constant slice width keeps ONE kernel compile for all chunks.
    ``slice_frames=False`` passes the whole encoding (the HBM kernel
    streams its tables from HBM, so slicing buys nothing there).

    Each chunk runs as ONE jitted dispatch; ``pos_offset`` and the frame
    slice start are traced scalars, so every chunk shares one executable
    (wavenet_generate.jit_fused).
    """
    from music_tpu.generate.wavenet_generate import STEPS_PER_CALL, jit_fused

    if step_chunk is None:
        step_chunk = STEPS_PER_CALL
    pool = cfg.en_pool_kernel_size
    P = ctx.shape[1]
    F = encoding.shape[1]
    Fc = min(F, frame_window_width(P, step_chunk, pool))
    do_slice = slice_frames and Fc < F

    outs, done = [], 0
    while done < n_steps:
        k = min(n_steps - done, step_chunk)
        if do_slice:
            f0, pos = frame_window(done, F, Fc, pool)
            call = jit_fused(
                _sliced_ae_fused, fused=fused, cfg=cfg, Fc=Fc, n_steps=k, **kw
            )
            codes = call(
                params, (encoding, ctx),
                {"f0": jnp.asarray(f0, jnp.int32),
                 "pos_offset": jnp.asarray(pos, jnp.int32)},
            )
        else:
            call = jit_fused(fused, cfg=cfg, n_steps=k, **kw)
            codes = call(
                params, (encoding, ctx),
                {"pos_offset": jnp.asarray(done, jnp.int32)},
            )
        outs.append(codes)
        done += k
        if done < n_steps:
            ctx = jnp.concatenate([ctx, codes], axis=1)[:, -P:]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def generate(
    *,
    cfg: ae.WaveNetAEConfig,
    params=None,
    checkpoint_dir: str | Path | None = None,
    source_audio: np.ndarray | None = None,
    source_path: str | Path | None = None,
    out_path: str | Path,
    sr: int = 16000,
    duration: float | None = None,
    sample_mode: str = "argmax",
    seed: int = 0,
    backend: str = "fused",
) -> np.ndarray:
    """Reconstruct ``source`` through the bottleneck; write the decoded
    audio to ``out_path``.  ``duration`` limits the output length.
    ``backend``: "fused" (conditioned Pallas kernel, argmax) or "scan"."""
    if params is None:
        if checkpoint_dir is None:
            raise ValueError("need params or checkpoint_dir")
        example = ae.init_params(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.restore_subtree(checkpoint_dir, example, prefix=".params")
    if source_audio is None:
        if source_path is None:
            raise ValueError("need source_audio or source_path")
        source_audio, src_sr = wavio.read_wav(source_path)
        source_audio = wavio.resample(source_audio, src_sr, sr)

    codes = mu_law_encode_np(np.asarray(source_audio), cfg.quantization_channel)
    tokens = jnp.asarray(codes, jnp.int32)[None, :]
    encoding = _jit_encode(cfg)(params, tokens)

    n_steps = len(codes) if duration is None else min(int(duration * sr), len(codes))
    fused_min = cfg.receptive_field + max(cfg.dilations)
    if backend == "fused" and sample_mode == "argmax" and tokens.shape[1] >= fused_min:
        from music_tpu.kernels.wavenet_ae_decode import generate_tokens_fused

        out_codes = _chunked_ae_fused(
            generate_tokens_fused, params, encoding, tokens[:, :fused_min],
            cfg=cfg, n_steps=n_steps,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        prime_len = min(cfg.receptive_field, tokens.shape[1])
        prime = tokens[:, :prime_len]
        out_codes = ae.generate_tokens(
            params, encoding, prime, jax.random.PRNGKey(seed),
            cfg=cfg, n_steps=n_steps, sample_mode=sample_mode,
        )
    audio = np.asarray(mu_law_decode(out_codes[0], cfg.quantization_channel))
    wavio.write_wav(out_path, audio, sr)
    return audio


def generate_batch(
    *,
    cfg: ae.WaveNetAEConfig,
    params=None,
    checkpoint_dir: str | Path | None = None,
    source_audios: np.ndarray,
    out_dir: str | Path | None = None,
    sr: int = 16000,
    duration: float | None = None,
    dtype=jnp.float32,
    mesh=None,
) -> np.ndarray:
    """Serve ``n`` concurrent reconstructions; returns ``[n, T]`` audio.

    The autoencoder counterpart of wavenet_generate.generate_batch (the
    reference's generate.py decodes one utterance in an O(receptive-field)-
    per-sample Python loop): every source clip is encoded in one batched
    pass, then all streams decode through as few fused-kernel launches as
    possible — the resident conditioned kernel for <= 8 streams when the
    decoder fits VMEM, else the HBM-streaming kernel with interleaved
    8-stream groups (upgrading to HBM ring state when the group count
    exceeds the VMEM-ring cap).  Long decodes are chunked (bounded VMEM
    output + conditioning; dynamic pos_offset keeps the frame clock — one
    compile for all chunks).  Off TPU the whole batch runs as one batched
    ``lax.scan`` program.

    ``source_audios``: ``[n, T_src]`` float audio rows (equal length —
    conditioning frames must align).

    ``mesh``: a Mesh with a ``data`` axis scales reconstruction serving
    out over chips — encoding + prime rows shard over the axis and every
    device runs its own conditioned decode program (chunk loop traced
    inline, so one executable per row chunk); multi-PROCESS meshes
    transfer per-host rows both ways (``multihost.put_global_batch`` in,
    addressable shards out — each host writes wavs only for the rows its
    devices decoded).  Axes other than ``data`` must have size 1.
    """
    from music_tpu.kernels import wavenet_ae_decode as res_k
    from music_tpu.generate.wavenet_generate import STEPS_PER_CALL

    if params is None:
        if checkpoint_dir is None:
            raise ValueError("need params or checkpoint_dir")
        example = ae.init_params(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.restore_subtree(checkpoint_dir, example, prefix=".params")

    src = np.asarray(source_audios)
    if src.ndim != 2:
        raise ValueError("source_audios must be [n, T] rows of equal length")
    n = src.shape[0]
    codes = np.stack([mu_law_encode_np(row, cfg.quantization_channel) for row in src])
    tokens = jnp.asarray(codes, jnp.int32)
    encoding = _jit_encode(cfg)(params, tokens)

    n_steps = src.shape[1] if duration is None else min(int(duration * sr), src.shape[1])
    fused_min = cfg.receptive_field + max(cfg.dilations)
    on_tpu = jax.default_backend() == "tpu"

    out_codes = None
    mine = None
    D = mesh.shape.get("data", 1) if mesh is not None else 1
    if mesh is not None and D > 1:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P_

        from music_tpu.parallel import multihost

        if int(np.prod([s for a, s in mesh.shape.items() if a != "data"])) != 1:
            raise ValueError("AE serving mesh must be data-only (other axes = 1)")
        multiproc = jax.process_count() > 1
        per_dev = -(-n // D)
        fused_fn, rows_planned, extra = None, per_dev, {}
        call_steps = min(n_steps, STEPS_PER_CALL)
        if on_tpu and tokens.shape[1] >= fused_min:
            fused_fn, rows_planned, extra = plan_ae_serving(
                cfg, params, per_dev, dtype, call_steps
            )
        per_call = D * rows_planned
        ctx_len = fused_min if fused_fn is not None else min(
            cfg.receptive_field, tokens.shape[1]
        )
        prime_np = np.asarray(tokens[:, :ctx_len])
        enc_np = np.asarray(encoding)

        def body(p, enc_l, ctx_l):
            # one device's rows; the chunk loop (tail re-prime +
            # pos_offset frame clock) traces inline — one executable.
            # step_chunk must equal the plan's call_steps: the resident
            # kernel's cond-table VMEM was budgeted for that window
            if fused_fn is not None:
                return _chunked_ae_fused(
                    fused_fn, p, enc_l, ctx_l, cfg=cfg, n_steps=n_steps,
                    slice_frames=fused_fn is res_k.generate_tokens_fused,
                    step_chunk=call_steps, dtype=dtype, **extra,
                )
            return ae.generate_tokens(
                p, enc_l, ctx_l, jax.random.PRNGKey(0), cfg=cfg,
                n_steps=n_steps, sample_mode="argmax",
            )

        pspecs = jax.tree_util.tree_map(lambda _: P_(), params)
        prog = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(pspecs, P_("data", None, None), P_("data", None)),
            out_specs=P_("data", None),
            check_vma=False,  # Pallas out_shapes have no vma (see
            # wavenet_generate.sharded_rows_program)
        ))
        params_g = (
            jax.device_put(params, NamedSharding(mesh, P_()))
            if multiproc else params
        )
        parts = []
        for lo in range(0, n, per_call):
            enc_c = enc_np[lo : lo + per_call]
            pr_c = prime_np[lo : lo + per_call]
            pad = per_call - enc_c.shape[0]
            if pad:
                enc_c = np.concatenate(
                    [enc_c, np.tile(enc_c[-1:], (pad, 1, 1))], axis=0
                )
                pr_c = np.concatenate(
                    [pr_c, np.tile(pr_c[-1:], (pad, 1))], axis=0
                )
            parts.append(prog(
                params_g,
                multihost.put_global_batch(mesh, enc_c),
                multihost.put_global_batch(mesh, pr_c),
            ))
        if multiproc:
            # assemble this host's rows; remember which global rows we
            # hold (same scheme as wavenet_generate.generate_batch)
            rows_out, held = [], []
            for pi, part in enumerate(parts):
                local = np.zeros(part.shape, np.int32)
                for shard in part.addressable_shards:
                    local[shard.index] = np.asarray(shard.data)
                    held.extend(
                        pi * per_call + r
                        for r in range(*shard.index[0].indices(part.shape[0]))
                    )
                rows_out.append(local)
            out_codes = np.concatenate(rows_out, axis=0)[:n]
            mine = sorted(r for r in set(held) if r < n)
        else:
            out_codes = jnp.concatenate(parts, axis=0)[:n]
    elif on_tpu and tokens.shape[1] >= fused_min:
        call_steps = min(n_steps, STEPS_PER_CALL)
        prime = tokens[:, :fused_min]
        try:
            fused_fn, per_call_rows, extra = plan_ae_serving(
                cfg, params, n, dtype, call_steps
            )
            slice_f = fused_fn is res_k.generate_tokens_fused
            parts = []
            for lo in range(0, n, per_call_rows):
                rows = prime[lo : lo + per_call_rows]
                enc = encoding[lo : lo + per_call_rows]
                kw = dict(extra)
                if kw.get("n_stream_groups", 1) > 1:
                    # a partial last chunk launches fewer groups
                    S_pl = extra.get("n_streams", res_k.N_STREAMS)
                    kw["n_stream_groups"] = -(-rows.shape[0] // S_pl)
                # kernel kwargs ride through to jit_fused's static key —
                # a fresh functools.partial here would defeat its cache
                # and recompile every request.  step_chunk == the plan's
                # call_steps (the resident cond-table VMEM budget)
                parts.append(
                    _chunked_ae_fused(
                        fused_fn, params, enc, rows, cfg=cfg,
                        n_steps=n_steps, slice_frames=slice_f,
                        step_chunk=call_steps, dtype=dtype, **kw,
                    )
                )
            out_codes = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        except NotImplementedError:
            # no fused kernel fits this config (lane/row constraints,
            # filter width, VMEM) — the batched scan path below serves it
            out_codes = None
    if out_codes is None:
        keys = jax.random.PRNGKey(0)
        out_codes = ae.generate_tokens(
            params, encoding, tokens[:, : min(cfg.receptive_field, tokens.shape[1])],
            keys, cfg=cfg, n_steps=n_steps, sample_mode="argmax",
        )

    audio = np.asarray(mu_law_decode(out_codes[:n], cfg.quantization_channel))
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        # multi-process: write only the rows this host actually decoded
        for i in (range(n) if mine is None else mine):
            wavio.write_wav(out_dir / f"recon_{i:03d}.wav", audio[i], sr)
    return audio
