"""WaveNet-autoencoder training: jitted train step + public train() loop.

Parity surface: wavenet_autoencoder/train.py (a copy of wavenet's loop with
an added lbfgs option :33-34 and the same rotating checkpoints :147-160).
The reference subproject is missing its dataset module and two param files
(train.py:7,21-23 — SURVEY.md §5); this entry point wires the shared
pipeline (music_tpu.data.audio) instead, which is the intended behavior.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.core.metrics import Meter, MetricsLogger, Throughput
from music_tpu.core.optim import from_config as optimizer_from_config
from music_tpu.core.prng import KeySeq
from music_tpu.data.audio import AudioWindows
from music_tpu.data.prefetch import PrefetchBatches
from music_tpu.models import wavenet_ae as ae
from music_tpu.models.wavenet_ae import _upsample_cond
from music_tpu.ops.conv import conv1x1, dilated_causal_conv, token_causal_conv
from music_tpu.train.wavenet_train import TrainState


def ae_param_specs(cfg: ae.WaveNetAEConfig, tp: bool) -> dict:
    """PartitionSpecs: with ``tp``, the decoder's 512-channel skip pathway
    is Megatron-split over ``model`` (column-parallel skip projections,
    row-parallel conn1 with one psum); the small encoder and conditioning
    projections stay replicated."""
    specs = {k: P() for k in (
        "en_causal", "en_dil", "en_dense", "bottleneck",
        "de_causal", "fg", "cond_fg", "dense", "cond_post", "conn2",
    )}
    specs["skip"] = P(None, None, "model") if tp else P()
    specs["conn1"] = P("model", None) if tp else P()
    return specs


def _seq_sharded_encode(params, inputs, cfg: ae.WaveNetAEConfig, sp: int):
    """Sequence-parallel encoder: activations sharded over the ``seq`` axis.

    Each shard owns ``w = E/sp`` time positions of every layer's activation
    (E = encoder output length) and receives each layer's ``dilation``-wide
    left context from its left neighbor via :func:`left_halo_exchange`
    (``ppermute`` — gradients flow back through the exchange).  Shard 0's
    context comes from a replicated *margin* buffer holding the global
    receptive-field zone [0, sum(d)); the margin shrinks by d per layer and
    is fully consumed by the last one — so the result is EXACTLY the
    unsharded valid-conv encoder (tests/test_wavenet_ae_seq.py), the conv
    analog of ring attention (SURVEY.md §2.6).
    """
    from music_tpu.parallel.halo import left_halo_exchange

    M = sum(cfg.dilations)
    Ti = inputs.shape[1]
    E = Ti - 1 - M  # encoder output length (valid convs, fw=2)
    w = E // sp
    s = jax.lax.axis_index("seq")

    # layer-0 activations: local chunk (w+1 tokens -> w positions) + margin
    local_toks = jax.lax.dynamic_slice_in_dim(inputs, M + s * w, w + 1, axis=1)
    x = token_causal_conv(local_toks, params["en_causal"])      # [B, w, Cr]
    margin = token_causal_conv(inputs[:, : M + 1], params["en_causal"])  # [B, M, Cr]

    remaining = M
    for i, d in enumerate(cfg.dilations):
        fill = margin[:, -d:, :]
        x_ext = left_halo_exchange(x, d, "seq", first_shard_fill=fill)
        h = jax.nn.relu(x_ext)
        h = dilated_causal_conv(h, params["en_dil"][i], dilation=d, fuse_taps=True)
        h = jax.nn.relu(h)
        h = conv1x1(h, params["en_dense"][i])
        x = h + x  # residual: x_ext[:, d:] == x

        remaining -= d
        if remaining > 0:  # the last layer consumes the margin entirely
            mh = jax.nn.relu(margin)
            mh = dilated_causal_conv(mh, params["en_dil"][i], dilation=d, fuse_taps=True)
            mh = jax.nn.relu(mh)
            mh = conv1x1(mh, params["en_dense"][i])
            margin = mh + margin[:, d:, :]

    x = conv1x1(x, params["bottleneck"])                        # [B, w, W]
    k = cfg.en_pool_kernel_size
    frames = x.reshape(x.shape[0], w // k, k, -1).mean(axis=2)  # local pool
    # global encoding: contiguous shard chunks in order
    return jax.lax.all_gather(frames, "seq", axis=1, tiled=True)


def _seq_sharded_decode_loss(params, inputs, targets, encoding, cfg, sp):
    """Sequence-parallel decoder + loss: same margin/halo scheme as
    :func:`_seq_sharded_encode` (each shard owns w output positions; halos
    via ppermute, shard 0 fed from the replicated receptive-field margin),
    with the conditioning upsample indexed by each position's coordinate in
    the GLOBAL layer buffer — reproducing the unsharded
    ``_upsample_cond(encoding, fg.shape[1])`` semantics exactly.  The skip
    pathway keeps its ``model``-axis split (every local position is a final
    output position, so all local skip taps contribute)."""
    from music_tpu.parallel.halo import left_halo_exchange

    Cd = cfg.de_dilation_channel
    M = sum(cfg.dilations)
    Ti = inputs.shape[1]
    O = Ti - 1 - M  # output width
    w = O // sp
    F = encoding.shape[1]
    s = jax.lax.axis_index("seq")

    local_toks = jax.lax.dynamic_slice_in_dim(inputs, M + s * w, w + 1, axis=1)
    x = token_causal_conv(local_toks, params["de_causal"])          # [B, w, Cr]
    margin = token_causal_conv(inputs[:, : M + 1], params["de_causal"])

    def cond(start, length, proj):
        """Conditioning rows for global-buffer positions [start, start+len)
        of a buffer of total length ``buf_len`` (closure arg below)."""
        idx = ((start + jnp.arange(length)) * F) // cond.buf_len
        return conv1x1(jnp.take(encoding, idx, axis=1), proj)

    remaining = M
    skip_total = None
    for i, d in enumerate(cfg.dilations):
        remaining -= d
        buf_len = remaining + O  # global length of this layer's output
        cond.buf_len = buf_len

        fill = margin[:, -d:, :]
        x_ext = left_halo_exchange(x, d, "seq", first_shard_fill=fill)
        fg = dilated_causal_conv(x_ext, params["fg"][i], dilation=d, fuse_taps=True)  # [B, w, 2Cd]
        fg = fg + cond(remaining + s * w, w, params["cond_fg"][i])
        z = jnp.tanh(fg[..., Cd:]) * jax.nn.sigmoid(fg[..., :Cd])
        x = conv1x1(z, params["dense"][i]) + x
        skip = conv1x1(z, params["skip"][i])                         # [B, w, Cs/m]
        skip_total = skip if skip_total is None else skip_total + skip

        if remaining > 0:
            mfg = dilated_causal_conv(margin, params["fg"][i], dilation=d, fuse_taps=True)
            mfg = mfg + cond(0, remaining, params["cond_fg"][i])
            mz = jnp.tanh(mfg[..., Cd:]) * jax.nn.sigmoid(mfg[..., :Cd])
            margin = conv1x1(mz, params["dense"][i]) + margin[:, d:, :]

    h = jax.nn.relu(skip_total)
    h = jax.lax.psum(conv1x1(h, params["conn1"]), "model")  # row-parallel
    cond.buf_len = O
    h = h + cond(s * w, w, params["cond_post"])
    h = jax.nn.relu(h)
    logits = conv1x1(h, params["conn2"])

    targets_local = jax.lax.dynamic_slice_in_dim(targets, s * w, w, axis=1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets_local[..., None], axis=-1)
    # equal-size shards: mean of local means over (data, seq) = global mean
    return jax.lax.pmean(jnp.mean(nll), ("data", "seq"))


def _sharded_ae_loss(params, tokens, cfg: ae.WaveNetAEConfig, sp: int = 1):
    """Local loss inside shard_map: batch over ``data``, skip pathway over
    ``model``, and — when the window divides evenly — the time axis of BOTH
    the encoder and the decoder over ``seq`` with per-layer halo exchange
    (:func:`_seq_sharded_encode` / :func:`_seq_sharded_decode_loss`).
    Falls back to the seq-replicated computation when shapes don't divide."""
    Cd = cfg.de_dilation_channel
    inputs = tokens[:, :-1]
    targets = tokens[:, cfg.receptive_field:]
    T = inputs.shape[1]
    output_width = T - cfg.receptive_field + 1

    M = sum(cfg.dilations)
    E = T - 1 - M
    k = cfg.en_pool_kernel_size
    used_seq = sp > 1 and E % sp == 0 and (E // sp) % k == 0
    if used_seq:
        encoding = _seq_sharded_encode(params, inputs, cfg, sp)
        return _seq_sharded_decode_loss(params, inputs, targets, encoding, cfg, sp)
    else:
        encoding = ae.encode(params, inputs, cfg)

    x = token_causal_conv(inputs, params["de_causal"])
    skip_total = None
    for i, d in enumerate(cfg.dilations):
        fg = dilated_causal_conv(x, params["fg"][i], dilation=d, fuse_taps=True)
        cond = conv1x1(_upsample_cond(encoding, fg.shape[1]), params["cond_fg"][i])
        fg = fg + cond
        z = jnp.tanh(fg[..., Cd:]) * jax.nn.sigmoid(fg[..., :Cd])
        dense = conv1x1(z, params["dense"][i])
        x = dense + x[:, -dense.shape[1]:, :]
        skip = conv1x1(z[:, -output_width:, :], params["skip"][i])  # [.., Cs/m]
        skip_total = skip if skip_total is None else skip_total + skip

    h = jax.nn.relu(skip_total)
    h = jax.lax.psum(conv1x1(h, params["conn1"]), "model")  # row-parallel
    h = h + conv1x1(_upsample_cond(encoding, h.shape[1]), params["cond_post"])
    h = jax.nn.relu(h)
    logits = conv1x1(h, params["conn2"])

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    # fallback path: seq-replicated computation, only data needs the mean
    return jax.lax.pmean(jnp.mean(nll), "data")


def make_loss_fn(cfg: ae.WaveNetAEConfig, mesh: Mesh):
    tp = mesh.shape["model"] > 1
    specs = ae_param_specs(cfg, tp)
    fn = shard_map(
        functools.partial(_sharded_ae_loss, cfg=cfg, sp=mesh.shape["seq"]),
        mesh=mesh,
        in_specs=(specs, P("data", None)),
        out_specs=P(),
    )
    return fn, specs


def make_train_step(cfg: ae.WaveNetAEConfig, tx: optax.GradientTransformation,
                    mesh: Mesh | None = None):
    if mesh is None:
        loss_fn = lambda p, t: ae.loss_fn(p, t, cfg)
    else:
        loss_fn, _ = make_loss_fn(cfg, mesh)

    @jax.jit
    def train_step(state: TrainState, tokens: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, tokens)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def train(
    *,
    model_params: Mapping[str, Any],
    dataset_params: Mapping[str, Any],
    train_params: Mapping[str, Any],
    mesh: Mesh | None = None,
) -> TrainState:
    """Public train() (wavenet_autoencoder/train.py:66-167 surface)."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    cfg = ae.WaveNetAEConfig.from_json(dict(model_params))
    mesh = mesh or make_mesh(MeshSpec(data=-1))
    tx = optimizer_from_config(train_params)
    keys = KeySeq(train_params.get("seed", 0))

    windows = AudioWindows.from_pickle(
        dataset_params["audio_path"],
        receptive_field=cfg.receptive_field,
        window_length=dataset_params["window_length"],
    )
    windows.check_vocab(cfg.quantization_channel)
    logger = MetricsLogger(train_params.get("log_dir", "logs/wavenet_ae"))
    ckpt_dir = train_params.get("restore_dir", "checkpoints/wavenet_ae")

    params = ae.init_params(keys.next(), cfg)
    specs = ae_param_specs(cfg, mesh.shape["model"] > 1)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, {k: specs[k] for k in params},
    )
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, start_step = ckpt_lib.restore_or_init(ckpt_dir, state)

    train_step = make_train_step(cfg, tx, mesh)
    sharding = NamedSharding(mesh, P("data", None))

    meter, thru = Meter(), Throughput()
    print_every = train_params.get("print_every", 100)
    step = start_step
    for epoch in range(train_params.get("num_epochs", 1)):
        for batch in PrefetchBatches(windows.batches(
            dataset_params["batch_size"], seed=train_params.get("seed", 0) + epoch
        )):
            tokens = jax.device_put(batch, sharding)
            state, loss = train_step(state, tokens)
            step += 1
            meter.update(float(loss))
            thru.update(batch.shape[0])
            if step % print_every == 0:
                logger.log_loss(epoch, step, meter.mean, pieces_per_sec=round(thru.rate, 2))
                meter.reset()
        ckpt_lib.save(
            ckpt_dir, step, state,
            max_checkpoints=train_params.get("max_check_points", 10),
        )
        logger.log_event(f"saved checkpoint at step {step}")
    return state
