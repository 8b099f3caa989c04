"""WaveNet training: jitted/sharded train step + the public train() loop.

Parity surface: wavenet/train.py (JSON configs -> model -> loader ->
DataParallel -> epoch loop with CE loss, text-log every print_every,
rotating checkpoints).  TPU redesign:

- the train step is ONE compiled program: loss, grads, optimizer update,
  all device-resident (vs per-batch Python orchestration + H2D one-hot
  transfers, wavenet/train.py:169-193);
- parallelism is a 3-axis mesh, not DataParallel:
  * ``data``  — batch sharding (the reference's only parallelism,
    wavenet/train.py:116-122);
  * ``seq``   — sequence sharding for the 44k-sample windows: each seq shard
    recomputes its receptive-field overlap from the (tiny, replicated)
    integer token window instead of exchanging 40 per-layer activation
    halos — zero forward communication (SURVEY.md §2.6);
  * ``model`` — Megatron-style sharding of the 512-channel skip pathway:
    skip projections column-parallel, post1 row-parallel with one psum.
- gradients: ``jax.grad`` differentiates *through* ``shard_map``, so the
  backward collectives (grad all-reduce over data/seq, partial-grad psum
  over model) are derived by JAX, not hand-written.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.core.metrics import Meter, MetricsLogger, Throughput
from music_tpu.core.optim import from_config as optimizer_from_config
from music_tpu.core.prng import KeySeq
from music_tpu.data.audio import AudioWindows
from music_tpu.data.prefetch import PrefetchBatches
from music_tpu.models import wavenet as wn
from music_tpu.models.wavenet import WaveNetConfig
from music_tpu.ops.conv import conv1x1, dilated_causal_conv, token_causal_conv


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def param_specs(cfg: WaveNetConfig, tp: bool) -> dict:
    """PartitionSpecs per parameter.  With ``tp``, the skip-channel axis is
    sharded over ``model``: skip [L, Cd, Cs@model], post1 [Cs@model, Cs]
    (row-parallel — one psum in forward), post2 replicated."""
    specs = {
        "causal": P(),
        "fg": P(),
        "dense": P(),
        "skip": P(None, None, "model") if tp else P(),
        "post1": P("model", None) if tp else P(),
        "post2": P(),
    }
    if cfg.use_bias:
        specs.update(
            causal_b=P(), fg_b=P(), dense_b=P(),
            skip_b=P(None, "model") if tp else P(),
            post1_b=P(), post2_b=P(),
        )
    return specs


def _sharded_loss(params, tokens, cfg: WaveNetConfig, window_length: int, sp: int,
                  compute_dtype=None, stack_skips: bool = False,
                  skip_block: int = 0):
    """Local (per-shard) loss inside shard_map.

    ``tokens``: [B_local, RF + WL] — batch sharded over ``data``, replicated
    over ``seq``/``model`` (the int window is ~176 KB; replication is cheaper
    than 40 per-layer halo exchanges).  Each seq shard slices its
    ``RF + WL/sp`` sub-window and computes a valid causal forward over it.
    """
    rf = cfg.receptive_field
    wl_local = window_length // sp
    s = jax.lax.axis_index("seq") * wl_local
    # local sub-window: targets [rf + s, rf + s + wl_local), inputs need
    # rf - 1 + wl_local context tokens starting at s
    tok = jax.lax.dynamic_slice_in_dim(tokens, s, rf + wl_local, axis=1)
    inputs, targets = tok[:, :-1], tok[:, rf:]

    if compute_dtype is not None:
        # mixed precision: matmuls/activations in compute_dtype (bf16 keeps
        # the MXU at full rate), master params stay f32, loss math in f32
        params = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), params)

    use_bias = cfg.use_bias
    L, Cd = len(cfg.dilations), cfg.dilation_channels
    # skip-GEMM formulation: 0/1 = per-layer narrow GEMMs (the measured
    # round-4 winner); K > 1 = stacked [B·T, K·Cd] x [K·Cd, Cs] GEMMs per
    # K-layer block (block-matmul identity: the layer sum IS the stacked
    # contraction).  K = L is the round-4 ``stack_skips`` lever that LOST
    # on hardware (+17% — it must materialize the whole [B·T, L·Cd]
    # concat); small K trades a K-deep contraction (K·Cd = full 128-MXU
    # depth at K=4) for a K x smaller concat that can stay in VMEM —
    # VERDICT r4 #7's layer-blocked variant, A/B'd in train_gemm_ab.
    K = L if stack_skips else max(skip_block, 0)
    x = token_causal_conv(inputs, params["causal"], params.get("causal_b") if use_bias else None)
    out_width = wl_local
    skip_total = None
    zs = []  # blocked mode: gated activations collected for one wide GEMM
    for i, d in enumerate(cfg.dilations):
        # fuse_taps: one [B·T, 2Cr]x[2Cr, 2Cd] GEMM per layer — the train
        # step is lane-width-bound and the doubled contraction depth is
        # worth +9-17% (docs/BENCHMARKS.md "Training GEMM width A/B")
        fg = dilated_causal_conv(
            x, params["fg"][i], params["fg_b"][i] if use_bias else None,
            dilation=d, fuse_taps=True,
        )
        z = jnp.tanh(fg[..., : cfg.dilation_channels]) * jax.nn.sigmoid(
            fg[..., cfg.dilation_channels :]
        )
        dense = conv1x1(z, params["dense"][i], params["dense_b"][i] if use_bias else None)
        x = dense + x[:, -dense.shape[1]:, :]
        if K > 1:
            zs.append(z[:, -out_width:, :])
            if len(zs) == K or i + 1 == L:
                k0 = i + 1 - len(zs)
                z_blk = jnp.concatenate(zs, axis=-1)  # [B, W, len·Cd]
                blk = conv1x1(
                    z_blk, params["skip"][k0 : i + 1].reshape(len(zs) * Cd, -1),
                    None,
                )
                if use_bias:
                    blk = blk + jnp.sum(params["skip_b"][k0 : i + 1], axis=0)
                skip_total = blk if skip_total is None else skip_total + blk
                zs = []
            continue
        # column-parallel skip projection: local [B, W, Cs/m]
        skip = conv1x1(
            z[:, -out_width:, :], params["skip"][i],
            params["skip_b"][i] if use_bias else None,
        )
        skip_total = skip if skip_total is None else skip_total + skip

    h = jax.nn.relu(skip_total)
    # row-parallel post1: partial products psum'd over model
    h = jax.lax.psum(conv1x1(h, params["post1"]), "model")
    if use_bias:
        h = h + params["post1_b"]
    h = jax.nn.relu(h)
    logits = conv1x1(h, params["post2"], params.get("post2_b") if use_bias else None)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    # mean over local batch/time, then over data+seq shards (equal weights)
    return jax.lax.pmean(jnp.mean(nll), ("data", "seq"))


def make_loss_fn(cfg: WaveNetConfig, mesh: Mesh, window_length: int,
                 compute_dtype=None, stack_skips: bool = False,
                 skip_block: int = 0):
    """Global scalar loss over the mesh: shard_map of the local loss,
    differentiable with ``jax.grad`` (backward collectives auto-derived).
    ``compute_dtype=jnp.bfloat16`` enables mixed-precision matmuls.
    ``stack_skips`` computes the skip projection as one stacked
    [B·T, L·Cd] x [L·Cd, Cs] GEMM; ``skip_block=K`` is the blocked
    middle ground (same math; see _sharded_loss)."""
    sp = mesh.shape["seq"]
    if window_length % sp != 0:
        raise ValueError(f"window_length {window_length} % seq axis {sp} != 0")
    tp = mesh.shape["model"] > 1
    specs = param_specs(cfg, tp)

    fn = shard_map(
        functools.partial(
            _sharded_loss, cfg=cfg, window_length=window_length, sp=sp,
            compute_dtype=compute_dtype, stack_skips=stack_skips,
            skip_block=skip_block,
        ),
        mesh=mesh,
        in_specs=(specs, P("data", None)),
        out_specs=P(),
    )
    return fn, specs


def make_train_step(cfg: WaveNetConfig, tx: optax.GradientTransformation, mesh: Mesh,
                    window_length: int, compute_dtype=None,
                    stack_skips: bool = False, skip_block: int = 0):
    """One compiled update: grads through the sharded loss + optax update."""
    loss_fn, specs = make_loss_fn(
        cfg, mesh, window_length, compute_dtype, stack_skips=stack_skips,
        skip_block=skip_block,
    )

    @jax.jit
    def train_step(state: TrainState, tokens: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, tokens)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step, specs


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def init_state(
    key: jax.Array, cfg: WaveNetConfig, tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
) -> TrainState:
    params = wn.init_params(key, cfg)
    if mesh is not None:
        specs = param_specs(cfg, mesh.shape["model"] > 1)
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            {k: specs[k] for k in params},
        )
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def train(
    *,
    wavenet_params: Mapping[str, Any],
    dataset_params: Mapping[str, Any],
    train_params: Mapping[str, Any],
    mesh: Mesh | None = None,
) -> TrainState:
    """Public train() — the reference entry point (wavenet/train.py:76-226)
    over repaired JSON param dicts (see music_tpu.core.config).

    Multi-host: set ``train_params["coordinator"]`` (+ ``num_processes``,
    ``process_id``, e.g. from the CLI flags) — each process then joins the
    jax.distributed cluster, the mesh spans all global devices, every host
    feeds only its own batch rows, and checkpoints/logs write on process 0.
    """
    from music_tpu.parallel import multihost
    from music_tpu.parallel.mesh import make_mesh, MeshSpec

    if train_params.get("coordinator") or train_params.get("num_processes"):
        multihost.initialize(
            train_params.get("coordinator"),
            train_params.get("num_processes"),
            train_params.get("process_id"),
        )

    cfg = WaveNetConfig.from_json(dict(wavenet_params))
    mesh = mesh or make_mesh(MeshSpec(data=-1))
    is_main = jax.process_index() == 0
    tx = optimizer_from_config(train_params)
    keys = KeySeq(train_params.get("seed", 0))

    windows = AudioWindows.from_pickle(
        dataset_params["audio_path"],
        receptive_field=cfg.receptive_field,
        window_length=dataset_params["window_length"],
    )
    windows.check_vocab(cfg.quantization_channels)
    logger = MetricsLogger(train_params.get("log_dir", "logs/wavenet"))
    ckpt_dir = train_params.get("restore_dir", "checkpoints/wavenet")

    state = init_state(keys.next(), cfg, tx, mesh)
    state, start_step = ckpt_lib.restore_or_init(ckpt_dir, state)

    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
        train_params.get("compute_dtype", "float32")
    )
    train_step, _ = make_train_step(
        cfg, tx, mesh, dataset_params["window_length"], compute_dtype
    )

    meter, thru = Meter(), Throughput()
    print_every = train_params.get("print_every", 100)
    step = start_step
    for epoch in range(train_params.get("num_epochs", 1)):
        # every process iterates the same (seeded) global batch order and
        # contributes only its host_shard rows inside put_global_batch
        for batch in PrefetchBatches(windows.batches(
            dataset_params["batch_size"], seed=train_params.get("seed", 0) + epoch
        )):
            tokens = multihost.put_global_batch(mesh, batch)
            state, loss = train_step(state, tokens)
            step += 1
            meter.update(float(loss))
            thru.update(batch.shape[0])
            if step % print_every == 0 and is_main:
                logger.log_loss(epoch, step, meter.mean, pieces_per_sec=round(thru.rate, 2))
                meter.reset()
        if is_main:
            ckpt_lib.save(
                ckpt_dir, step, state,
                max_checkpoints=train_params.get("max_check_points", 10),
            )
            logger.log_event(f"saved checkpoint at step {step}")
    return state
