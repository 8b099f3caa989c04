"""Persistent multi-stream decode sessions (continuous batching).

Production serving needs streams that start and stop INDEPENDENTLY while
the chip stays busy: a request joins mid-flight, generates for a while,
and leaves without disturbing the others.  The reference's serving story
(wavenet/fast_generate.py:144-186) is one stream per process in a Python
loop; music_tpu's :func:`generate_batch` serves fixed batches.  This
module adds the layer between them: a :class:`DecodeSession` holds a
FIXED row capacity — so ONE Pallas compile serves the whole session
lifetime (a per-call group count would recompile for minutes on every
admission change) — packs whatever streams are active into those rows
each :meth:`step`, and re-primes every kernel call from the per-stream
tail context.  Tail re-priming is the chunk-hand-off scheme proven
token-exact against single-call decodes (tests/test_pallas_decode.py);
priming is a *parallel* conv forward (MXU-batched, not sequential), so
its cost is small against the >=2048-step calls the dispatch overhead
already demands (CLAUDE.md perf rules).

TPU-first consequences of the design:
  - one fused-kernel launch per step() regardless of how many streams
    are active (idle rows decode padding and are discarded — the
    continuous-batching tradeoff);
  - all shapes static: capacity, steps_per_call, and the kernel mode are
    fixed at construction;
  - per-call seeds advance so categorical streams stay independent
    across steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.models import wavenet as wn
from music_tpu.ops.mulaw import mu_law_decode


def _partition_host_rows(rows: int, capacity: int, nproc: int) -> tuple[int, int]:
    """Partition a session's global kernel rows by host: returns
    ``(host_rows, host_capacity)`` for THIS process.  Host capacities sum
    to exactly ``capacity`` across the cluster (remainder spread over the
    first processes), so an explicit admission bound is never exceeded
    cluster-wide."""
    if rows % nproc:
        raise ValueError(
            f"{rows} kernel rows not divisible by {nproc} processes"
        )
    host_rows = rows // nproc
    pid = jax.process_index()
    host_cap = capacity // nproc + (1 if pid < capacity % nproc else 0)
    return host_rows, min(host_rows, host_cap)


def _put_host_rows(mesh, x: np.ndarray, global_rows: int, spec):
    """Assemble this host's row block into the data-sharded global array
    (the multihost.put_global_batch transport, session form)."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), x, global_shape=(global_rows,) + x.shape[1:]
    )


def _gather_host_rows(out_g) -> np.ndarray:
    """This host's rows of a data-sharded result, in global row order."""
    shards = sorted(
        out_g.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


class DecodeSession:
    """Serve WaveNet decode streams that join and leave over time.

    >>> sess = DecodeSession(cfg, params, capacity=32)
    >>> a = sess.add(); b = sess.add(prime_codes)
    >>> out = sess.step()          # {a: codes, b: codes} — one kernel call
    >>> sess.finish(a)
    >>> c = sess.add()             # joins without recompiling
    >>> audio_b = sess.audio(out[b])

    ``capacity``: max concurrent streams — an ADMISSION bound, never
    raised (the kernel may launch more rows to fill whole groups; the
    VMEM plan may LOWER it — read ``session.capacity`` after
    construction).  With ``mesh``, ``capacity`` is the TOTAL across
    devices; omitting it defaults to one full kernel group per device
    on the fused path (one sublane tile of rows per device on scan).
    ``steps_per_call``: samples every stream advances per :meth:`step`
    (fixed — a varying step count is a fresh kernel compile).
    ``backend``: "auto" (fused kernels on TPU, batched ``lax.scan``
    elsewhere), "scan" (force the scan path), or "fused-interpret"
    (resident kernel in interpret mode — CI/testing only; argmax).
    ``mesh``: a Mesh with a ``data`` axis scales the session out over
    chips — rows shard over it and every device runs its own kernel
    instance per step (decode has no cross-chip communication);
    per-device PRNG streams from ``axis_index``.  Axes other than
    ``data`` must have size 1.

    Multi-process: when the mesh spans processes (``jax.process_count()
    > 1``), the global row space is PARTITIONED BY HOST — each process
    admits streams into its own row block (``capacity`` then reports the
    per-host admission bound), packs only its local rows each step
    (``jax.make_array_from_process_local_data``, the same transport
    :func:`wavenet_generate.generate_batch` cluster-tests), and reads
    back only its own rows from the sharded output.  The step program is
    SPMD: EVERY process must call :meth:`step` in lockstep (a host with
    no active streams still launches — its rows decode silence padding
    and it returns ``{}``); admission stays host-local and never needs
    cross-host coordination.
    """

    def __init__(
        self,
        cfg: wn.WaveNetConfig,
        params: dict,
        *,
        capacity: int | None = None,
        dtype=jnp.bfloat16,
        sample_mode: str = "categorical",
        temperature: float = 1.0,
        seed: int = 0,
        steps_per_call: int = 4096,
        backend: str = "auto",
        mesh=None,
    ):
        from music_tpu.generate.wavenet_generate import plan_fused_serving

        self.cfg, self.params = cfg, params
        self.dtype = dtype
        self.sample_mode, self.temperature = sample_mode, temperature
        self.steps_per_call = int(steps_per_call)
        self._seed = int(seed) % 2**31
        self._prime_len = cfg.receptive_field + max(cfg.dilations)
        self._interpret = False
        self._extra: dict = {}

        self._mesh = mesh
        D = mesh.shape.get("data", 1) if mesh is not None else 1

        S = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
        want_total = int(capacity) if capacity else None
        # per-device rows for the plan; default = one sublane tile PER
        # DEVICE (the docstring's contract — an explicit capacity is
        # ceil-divided across devices instead)
        want = -(-want_total // D) if want_total else S
        on_tpu = jax.default_backend() == "tpu"
        if backend == "auto" and on_tpu:
            fused, S, g_max, rings = plan_fused_serving(
                cfg, S, dtype, self.steps_per_call, want
            )
            if rings:
                self._extra = {"rings_in_hbm": True}
        elif backend == "fused-interpret":
            from music_tpu.kernels import wavenet_decode

            if sample_mode != "argmax":
                raise ValueError("fused-interpret supports argmax only "
                                 "(no interpret PRNG lowering)")
            fused, g_max = wavenet_decode.generate_tokens_fused, -(-want // S)
            self._interpret = True
        elif backend in ("auto", "scan"):
            fused, g_max = None, 1
        else:
            raise ValueError(f"unknown backend {backend!r}")

        if fused is not None:
            self._G = min(g_max, max(1, -(-want // S)))
            per_dev = S * self._G
            self._S = S
        else:
            self._G, self._S = 1, S
            per_dev = want
        # _rows: what the kernel launches (whole groups); capacity: the
        # admission bound — an explicit request is never silently raised
        self._rows = D * per_dev
        self.capacity = (
            min(want_total, self._rows) if want_total else self._rows
        )
        self._nproc = jax.process_count() if mesh is not None else 1
        if self._nproc > 1:
            # per-host admission bound (the global row space is
            # partitioned by host; see the class docstring)
            self._host_rows, self.capacity = _partition_host_rows(
                self._rows, self.capacity, self._nproc
            )
        else:
            self._host_rows = self._rows
        self._fused = fused
        self._streams: dict[int, np.ndarray] = {}
        self._next_sid = 0
        self._sharded = (
            self._build_sharded_step(mesh) if mesh is not None else None
        )

    def _build_sharded_step(self, mesh):
        """One jitted program per step on a data mesh: every device runs
        its own kernel/scan instance with a PRNG stream offset by
        ``axis_index`` (scaffolding shared with generate_batch via
        wavenet_generate.sharded_rows_program)."""
        from music_tpu.generate.wavenet_generate import sharded_rows_program

        cfg, k = self.cfg, self.steps_per_call
        fused, S, G, dtype = self._fused, self._S, self._G, self.dtype
        mode, temp, extra = self.sample_mode, self.temperature, self._extra
        interpret = self._interpret

        def body(p, rows, seed_arr):
            seed = seed_arr[0] + jax.lax.axis_index("data")
            if fused is not None:
                return fused(
                    p, rows, cfg=cfg, n_steps=k, n_streams=S,
                    n_stream_groups=G, dtype=dtype, sample_mode=mode,
                    temperature=temp, seed=seed, interpret=interpret, **extra,
                )
            return wn.generate_tokens(
                p, rows, jax.random.PRNGKey(seed), cfg=cfg, n_steps=k,
                prime_len=rows.shape[1], sample_mode=mode, temperature=temp,
            )

        return sharded_rows_program(mesh, self.params, body)

    # -- admission -------------------------------------------------------
    @property
    def active(self) -> list[int]:
        return list(self._streams)

    def add(self, prime: np.ndarray | None = None) -> int:
        """Admit a stream; returns its id.  ``prime``: >= receptive_field
        + max dilation µ-law codes (defaults to silence, code Q//2 —
        fast_generate.py:158-161's convention)."""
        if prime is None:
            prime = np.full(
                (self._prime_len,), self.cfg.quantization_channels // 2, np.int32
            )
        prime = np.asarray(prime, np.int32)
        if prime.ndim != 1 or prime.shape[0] < self._prime_len:
            raise ValueError(
                f"prime must be [>= {self._prime_len}] codes, got {prime.shape}"
            )
        if len(self._streams) >= self.capacity:
            raise RuntimeError(
                f"session full ({self.capacity} streams); finish() one first"
            )
        sid = self._next_sid
        self._next_sid += 1
        self._streams[sid] = prime[-self._prime_len:]
        return sid

    def finish(self, sid: int) -> None:
        """Remove a stream; its rows free up at the next :meth:`step`."""
        del self._streams[sid]

    # -- decode ----------------------------------------------------------
    def step(self) -> dict[int, np.ndarray]:
        """Advance every active stream ``steps_per_call`` samples in one
        kernel launch; returns ``{sid: [steps_per_call] int32 codes}``."""
        multiproc = self._nproc > 1
        if not self._streams and not multiproc:
            return {}
        sids = list(self._streams)
        n_local = self._host_rows if multiproc else self._rows
        if sids:
            rows = np.stack([self._streams[s] for s in sids])
            pad = n_local - len(sids)
            if pad:  # every backend: occupancy must never change shapes
                rows = np.concatenate(
                    [rows, np.tile(rows[-1:], (pad, 1))], axis=0
                )
        else:
            # SPMD lockstep: an empty host still launches (silence rows)
            rows = np.full(
                (n_local, self._prime_len),
                self.cfg.quantization_channels // 2, np.int32,
            )
        rows = np.asarray(rows, np.int32)

        k = self.steps_per_call
        if multiproc:
            from jax.sharding import PartitionSpec as P

            out_g = self._sharded(
                self.params,
                _put_host_rows(self._mesh, rows, self._rows, P("data", None)),
                jnp.asarray([self._seed], jnp.int32),
            )
            out = _gather_host_rows(out_g)
        elif self._sharded is not None:
            rows = jnp.asarray(rows)
            out = self._sharded(
                self.params, rows, jnp.asarray([self._seed], jnp.int32)
            )
        elif self._fused is not None:
            from music_tpu.generate.wavenet_generate import jit_fused

            call = jit_fused(
                self._fused, cfg=self.cfg, n_steps=k,
                n_streams=self._S, n_stream_groups=self._G, dtype=self.dtype,
                sample_mode=self.sample_mode, temperature=self.temperature,
                interpret=self._interpret, **self._extra,
            )
            out = call(
                self.params, (rows,),
                {"seed": jnp.asarray(self._seed, jnp.int32)},
            )
        else:
            out = wn.generate_tokens(
                self.params, rows, jax.random.PRNGKey(self._seed),
                cfg=self.cfg, n_steps=k, prime_len=rows.shape[1],
                sample_mode=self.sample_mode, temperature=self.temperature,
            )
        # distinct PRNG stream per call; wrap — int32 SMEM operand, and
        # long-lived sessions would otherwise overflow after ~271k steps
        self._seed = (self._seed + 7919) % 2**31
        out = np.asarray(out)
        result = {}
        for i, sid in enumerate(sids):
            result[sid] = out[i]
            self._streams[sid] = np.concatenate(
                [self._streams[sid], out[i]]
            )[-self._prime_len:]
        return result

    def audio(self, codes: np.ndarray) -> np.ndarray:
        """µ-law-decode a stream's codes to float audio."""
        return np.asarray(mu_law_decode(codes, self.cfg.quantization_channels))

    # -- continuity -------------------------------------------------------
    def state_dict(self) -> dict:
        """Serializable session state: per-stream tail contexts + counters.
        A restored session continues every stream exactly where it left
        off (the tail IS the full decode state — re-priming rebuilds the
        kernel caches from it).  Pair with ``np.savez`` or
        ``core.checkpoint`` for failure recovery of a serving process."""
        return {
            "streams": {int(k): np.asarray(v) for k, v in self._streams.items()},
            "next_sid": self._next_sid,
            "seed": self._seed,
        }

    def load_state_dict(self, state: dict) -> None:
        """Restore :meth:`state_dict` output into this session (must be
        constructed with a compatible config/capacity)."""
        streams = state["streams"]
        if len(streams) > self.capacity:
            raise ValueError(
                f"state has {len(streams)} streams, capacity {self.capacity}"
            )
        for tail in streams.values():
            tail = np.asarray(tail)
            if tail.shape != (self._prime_len,):
                raise ValueError(
                    f"stream tail must be [{self._prime_len}], got {tail.shape}"
                )
        self._streams = {
            int(k): np.asarray(v, np.int32) for k, v in streams.items()
        }
        self._next_sid = int(state["next_sid"])
        self._seed = int(state["seed"]) % 2**31


class AEDecodeSession:
    """Continuous batching for autoencoder RECONSTRUCTION streams.

    The conditioned counterpart of :class:`DecodeSession`: every stream
    carries its own bottleneck encoding and its own utterance clock — the
    AE kernels accept a per-stream ``pos_offset`` vector, so streams that
    joined at different times share one launch, and each step slices a
    fixed-width window of each stream's encoding frames (bounded
    conditioning tables, one executable per session).

    Planning mirrors :func:`wavenet_ae_generate.generate_batch`: the
    resident kernel for <= 8 streams on VMEM-sized decoders, else the
    HBM-streaming kernel with interleaved 8-stream groups (per-stream
    frame-row conditioning DMAs; ``rings_in_hbm`` upgrade when the group
    count exceeds the VMEM-ring cap) — the reference-size AE serves 16+
    session streams through the same kernel the batch path uses.  Argmax
    decode (the AE kernels' sampling mode).  Off TPU the planned kernel
    runs in interpret mode (slow — CI/testing).

    >>> sess = AEDecodeSession(cfg, params)
    >>> a = sess.add(mu_law_codes_a)        # encode + admit
    >>> out = sess.step()                   # {a: codes}
    >>> b = sess.add(mu_law_codes_b)        # joins mid-flight
    >>> out = sess.step()                   # {a: ..., b: ...}

    ``mesh``: a Mesh with a ``data`` axis scales the session out over
    chips (rows shard over it; the decode is argmax-deterministic, so no
    per-device PRNG is needed).  With a mesh, ``capacity`` is the TOTAL
    across devices and the kernel is planned PER DEVICE.  Multi-process
    meshes partition the global row space BY HOST exactly like
    :class:`DecodeSession`: each process admits (and encodes) its own
    streams, ``capacity`` reports the per-host admission bound, and every
    process must call :meth:`step` in lockstep (an empty host launches
    silence rows and returns ``{}``).  Session state
    (:meth:`state_dict`) is host-local under multi-process.
    """

    def __init__(
        self,
        cfg,
        params: dict,
        *,
        capacity: int | None = None,
        dtype=jnp.float32,
        steps_per_call: int = 4096,
        encode_bucket: int | None = 4096,
        mesh=None,
        kernel: str = "auto",
    ):
        from music_tpu.generate.wavenet_ae_generate import (
            frame_window_width,
            plan_ae_serving,
        )
        from music_tpu.kernels import wavenet_ae_decode as res_k

        self.cfg, self.params = cfg, params
        self.dtype = dtype
        self.steps_per_call = int(steps_per_call)
        # native sublane tile height (16 bf16 / 8 f32) — must mirror
        # plan_ae_serving's choice, which the plan's extra also reports
        self._S = 16 if jnp.dtype(dtype) == jnp.bfloat16 else res_k.N_STREAMS
        self._mesh = mesh
        D = mesh.shape.get("data", 1) if mesh is not None else 1
        want = self._S * D if capacity is None else int(capacity)
        if want < 1:
            raise ValueError(f"capacity must be >= 1, got {want}")

        # plan the kernel PER DEVICE (shared policy with generate_batch);
        # kernel="hbm" pins the streaming kernel (plan_ae_serving docs)
        self._fused, per_dev, self._extra = plan_ae_serving(
            cfg, params, -(-want // D), dtype, self.steps_per_call,
            kernel=kernel,
        )
        self._rows = D * per_dev
        # admission bound: an explicit request is never silently raised
        self.capacity = min(want, self._rows) if capacity else self._rows
        self._nproc = jax.process_count() if mesh is not None else 1
        if self._nproc > 1:
            # per-host admission bound (global row space partitioned by
            # host; see the class docstring)
            self._host_rows, self.capacity = _partition_host_rows(
                self._rows, self.capacity, self._nproc
            )
        else:
            self._host_rows = self._rows
        self._prime_len = cfg.receptive_field + max(cfg.dilations)
        self._pool = cfg.en_pool_kernel_size
        # fixed encoding-frame window covering prime + one step
        self._Fc = frame_window_width(
            self._prime_len, self.steps_per_call, self._pool
        )
        # admissions pad sources up to a bucket length so the encoder
        # compiles once per bucket, not once per novel clip length (the
        # encoder is causal+valid, so appended samples never change the
        # frames the unpadded clip would produce); None = exact lengths
        self._encode_bucket = encode_bucket
        self._interpret = jax.default_backend() != "tpu"
        self._streams: dict[int, dict] = {}
        self._next_sid = 0
        self._sharded = (
            self._build_sharded_step(mesh) if mesh is not None else None
        )

    def _build_sharded_step(self, mesh):
        """One jitted program per step on a data mesh: rows, conditioning
        windows, and per-stream clocks shard over ``data``; every device
        runs its own planned-kernel instance (argmax — no PRNG).  Same
        check_vma note as wavenet_generate.sharded_rows_program."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if "data" not in mesh.axis_names:
            raise ValueError("serving mesh needs a 'data' axis")
        if int(np.prod([s for a, s in mesh.shape.items() if a != "data"])) != 1:
            raise ValueError("serving mesh must be data-only (other axes = 1)")
        cfg, k, dtype = self.cfg, self.steps_per_call, self.dtype
        fused, extra, interpret = self._fused, self._extra, self._interpret

        def body(p, wins, rows, offs):
            return fused(
                p, wins, rows, cfg=cfg, n_steps=k, dtype=dtype,
                pos_offset=offs, interpret=interpret, **extra,
            )

        pspecs = jax.tree_util.tree_map(lambda _: P(), self.params)
        return jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(pspecs, P("data", None, None), P("data", None), P("data")),
            out_specs=P("data", None),
            check_vma=False,
        ))

    @property
    def active(self) -> list[int]:
        return list(self._streams)

    def add(self, source_codes: np.ndarray) -> int:
        """Admit a reconstruction stream from its µ-law codes; encodes the
        bottleneck once.  Codes must cover at least the prime length."""
        from music_tpu.generate.wavenet_ae_generate import _jit_encode

        codes = np.asarray(source_codes, np.int32)
        if codes.ndim != 1 or codes.shape[0] < self._prime_len:
            raise ValueError(
                f"source must be [>= {self._prime_len}] codes, got {codes.shape}"
            )
        if len(self._streams) >= self.capacity:
            raise RuntimeError(
                f"session full ({self.capacity} streams); finish() one first"
            )
        enc_codes = codes
        if self._encode_bucket:
            b = self._encode_bucket
            padded = -(-codes.shape[0] // b) * b
            if padded > codes.shape[0]:
                enc_codes = np.concatenate(
                    [codes, np.full(padded - codes.shape[0], codes[-1], np.int32)]
                )
        enc = np.asarray(
            _jit_encode(self.cfg)(self.params, jnp.asarray(enc_codes)[None])[0]
        )
        # frames past the true utterance end come from pad codes; drop
        # them so the kernel's clamp-to-last-frame matches the unpadded
        # encode (the encoder is causal — earlier frames are unchanged)
        true_frames = max(
            1, (codes.shape[0] - 1 - sum(self.cfg.dilations)) // self._pool
        )
        enc = enc[: true_frames]
        sid = self._next_sid
        self._next_sid += 1
        self._streams[sid] = {
            "tail": codes[: self._prime_len],
            "clock": 0,  # absolute utterance time of tail[0]
            "enc": enc,
        }
        return sid

    def finish(self, sid: int) -> None:
        del self._streams[sid]

    def step(self) -> dict[int, np.ndarray]:
        """Advance every active stream ``steps_per_call`` samples in one
        kernel launch; returns ``{sid: [steps_per_call] int32 codes}``."""
        multiproc = self._nproc > 1
        if not self._streams and not multiproc:
            return {}
        from music_tpu.generate.wavenet_generate import jit_fused

        from music_tpu.generate.wavenet_ae_generate import frame_window

        sids = list(self._streams)
        rows, wins, offs = [], [], []
        Fc, pool = self._Fc, self._pool
        for sid in sids:
            st = self._streams[sid]
            enc, clock = st["enc"], st["clock"]
            F_s = enc.shape[0]
            if F_s >= Fc:
                f0, _ = frame_window(clock, F_s, Fc, pool)
                win = enc[f0 : f0 + Fc]
            else:
                # short utterance: repeat the last frame (matches the
                # kernel's clamp-to-last-frame semantics)
                f0 = 0
                win = np.concatenate(
                    [enc, np.repeat(enc[-1:], Fc - F_s, axis=0)], axis=0
                )
            rows.append(st["tail"])
            wins.append(win)
            offs.append(clock - f0 * pool)  # rebased step-0 clock
        n_local = self._host_rows if multiproc else self._rows
        if not sids:
            # SPMD lockstep: an empty host still launches (silence rows,
            # zero conditioning — outputs discarded)
            rows = [np.full(self._prime_len, self.cfg.quantization_channel // 2,
                            np.int32)]
            wins = [np.zeros((Fc, self.cfg.en_bottleneck_width), np.float32)]
            offs = [0]
        pad = n_local - len(rows)
        if pad:
            rows += [rows[-1]] * pad
            wins += [wins[-1]] * pad
            offs += [offs[-1]] * pad
        wins_a = np.stack(wins).astype(np.float32)
        rows_a = np.stack(rows).astype(np.int32)
        offs_a = np.asarray(offs, np.int32)

        k = self.steps_per_call
        if multiproc:
            from jax.sharding import PartitionSpec as P

            out_g = self._sharded(
                self.params,
                _put_host_rows(self._mesh, wins_a, self._rows, P("data", None, None)),
                _put_host_rows(self._mesh, rows_a, self._rows, P("data", None)),
                _put_host_rows(self._mesh, offs_a, self._rows, P("data")),
            )
            out = _gather_host_rows(out_g)
        elif self._sharded is not None:
            out = self._sharded(
                self.params, jnp.asarray(wins_a), jnp.asarray(rows_a),
                jnp.asarray(offs_a),
            )
        else:
            call = jit_fused(
                self._fused, cfg=self.cfg, n_steps=k, dtype=self.dtype,
                interpret=self._interpret, **self._extra,
            )
            out = call(
                self.params,
                (jnp.asarray(wins_a), jnp.asarray(rows_a)),
                {"pos_offset": jnp.asarray(offs_a)},
            )
        out = np.asarray(out)
        result = {}
        for i, sid in enumerate(sids):
            st = self._streams[sid]
            result[sid] = out[i]
            st["tail"] = np.concatenate([st["tail"], out[i]])[-self._prime_len:]
            st["clock"] += k
        return result

    def audio(self, codes: np.ndarray) -> np.ndarray:
        """µ-law-decode a stream's codes to float audio."""
        return np.asarray(mu_law_decode(codes, self.cfg.quantization_channel))

    # -- continuity (mirrors DecodeSession) --------------------------------
    def state_dict(self) -> dict:
        """Serializable session state: per-stream tails, utterance clocks,
        and bottleneck encodings.  A restored session continues every
        reconstruction stream exactly where it left off (no re-encode:
        the encoding is part of the state)."""
        return {
            "streams": {
                int(k): {
                    "tail": np.asarray(v["tail"]),
                    "clock": int(v["clock"]),
                    "enc": np.asarray(v["enc"]),
                }
                for k, v in self._streams.items()
            },
            "next_sid": self._next_sid,
        }

    def load_state_dict(self, state: dict) -> None:
        """Restore :meth:`state_dict` output into this session (must be
        constructed with a compatible config/capacity)."""
        streams = state["streams"]
        if len(streams) > self.capacity:
            raise ValueError(
                f"state has {len(streams)} streams, capacity {self.capacity}"
            )
        restored = {}
        for k, v in streams.items():
            tail = np.asarray(v["tail"], np.int32)
            if tail.shape != (self._prime_len,):
                raise ValueError(
                    f"stream tail must be [{self._prime_len}], got {tail.shape}"
                )
            restored[int(k)] = {
                "tail": tail,
                "clock": int(v["clock"]),
                "enc": np.asarray(v["enc"]),
            }
        self._streams = restored
        self._next_sid = int(state["next_sid"])
