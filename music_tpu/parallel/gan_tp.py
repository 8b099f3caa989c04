"""Model-axis (tensor-parallel) split of the 1720-filter GAN discriminator.

The widest layers in the GAN families are the 12-bank CNN discriminator and
its 1720-d highway (SeqGan_Pytorch/discriminator.py:38-91,
leak_gan/model.py:97-125 — shared shape).  Megatron-style split over the
``model`` mesh axis:

- each conv bank's output filters are column-split, so every shard computes
  a contiguous chunk of every bank's features; the full 1720-d feature
  vector is reassembled by scattering each chunk to its global (bank-major)
  offset in a zero buffer and psum'ing — one collective, no layout
  permutation, and the result is provably replicated (invarying) under
  shard_map's value-mesh-axis checks (an all_gather would stay 'varying');
- the highway's two F x F matmuls are column-split (full feature in, local
  columns out) — the elementwise gate then needs only the matching local
  feature columns;
- the 2-logit head is row-split with one more psum.

Communication per forward: one [B, F] psum + one [B, 2] psum over ICI.
Gradients come from differentiating through shard_map — the backward
collectives are derived by JAX.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from music_tpu.ops.rnn import linear


def discriminator_specs(cfg) -> dict:
    """PartitionSpecs for a SeqGAN/LeakGAN discriminator param pytree
    (init_discriminator's structure in either model module)."""
    n = len(cfg.num_filters)
    return {
        "embed": P(),
        "convs": [{"w": P(None, None, "model"), "b": P("model")} for _ in range(n)],
        "highway_h": {"w": P(None, "model"), "b": P("model")},
        "highway_t": {"w": P(None, "model"), "b": P("model")},
        "out": {"w": P("model", None), "b": P()},
    }


def discriminator_forward_tp(
    params: dict,
    tokens: jax.Array,
    cfg,
    *,
    axis_name: str = "model",
    dropout_key: jax.Array | None = None,
    post_highway_feature: bool = False,
    softmax_pred: bool = False,
):
    """shard_map body: model-parallel discriminator forward, numerically
    identical to the replicated ``discriminator_forward`` of either GAN
    (``post_highway_feature``/``softmax_pred`` select LeakGAN's contract;
    SeqGAN's is the default).  ``params`` are the per-shard slices produced
    by :func:`discriminator_specs`; ``tokens`` are replicated."""
    num_filters = tuple(cfg.num_filters)
    local_nf = params["convs"][0]["w"].shape[2]
    m = num_filters[0] // local_nf
    F = sum(num_filters)
    width = F // m
    offsets = np.concatenate([[0], np.cumsum(num_filters)])
    s = jax.lax.axis_index(axis_name)

    # 1. local chunk of every conv bank's features, scattered straight to
    #    its global bank-major offset; one psum reassembles the full vector
    x = jnp.take(params["embed"], tokens, axis=0)  # [B, T, E]
    B, T = tokens.shape
    buf = jnp.zeros((B, F), x.dtype)
    for i, conv in enumerate(params["convs"]):
        fs = conv["w"].shape[0]
        acc = None
        for k in range(fs):
            xs = jax.lax.slice_in_dim(x, k, T - fs + 1 + k, axis=1)
            term = jnp.einsum("bte,ef->btf", xs, conv["w"][k])
            acc = term if acc is None else acc + term
        acc = jax.nn.relu(acc + conv["b"])
        chunk = jnp.max(acc, axis=1)  # [B, nf_i/m]
        start = offsets[i] + s * (num_filters[i] // m)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, axis=1)
    f = jax.lax.psum(buf, axis_name)  # [B, F] global layout, replicated

    # 2. column-split highway: full f in, this shard's columns out
    h = jax.nn.relu(linear(params["highway_h"], f))     # [B, F/m]
    t = jax.nn.sigmoid(linear(params["highway_t"], f))  # [B, F/m]
    f_col = jax.lax.dynamic_slice_in_dim(f, s * width, width, axis=1)
    hw = t * h + (1.0 - t) * f_col

    if dropout_key is not None and cfg.dropout > 0:
        keep = 1.0 - cfg.dropout
        # replicated key -> identical full mask on every shard; each shard
        # applies its own column slice (matches the single-device mask)
        mask = jax.random.bernoulli(dropout_key, keep, (B, F))
        mask = jax.lax.dynamic_slice_in_dim(mask, s * width, width, axis=1)
        hw = jnp.where(mask, hw / keep, 0.0)

    # 3. row-split head: one psum
    score = jax.lax.psum(hw @ params["out"]["w"], axis_name) + params["out"]["b"]

    if post_highway_feature:
        # LeakGAN leaks the post-highway/dropout feature (model.py:118-125):
        # scatter the local column block to its offset and psum, as above
        fbuf = jnp.zeros((B, F), hw.dtype)
        fbuf = jax.lax.dynamic_update_slice_in_dim(fbuf, hw, s * width, axis=1)
        feature = jax.lax.psum(fbuf, axis_name)
    else:
        feature = f  # SeqGAN leaks pre-highway features
    pred = jax.nn.softmax(score, axis=-1) if softmax_pred else jax.nn.log_softmax(score, axis=-1)
    return {"pred": pred, "feature": feature, "score": score}


def leakgan_dis_loss_tp(d_params, tokens, labels, cfg, dropout_key=None,
                        axis_name: str = "model"):
    """Model-parallel LeakGAN D loss: CE + final-layer L2 (the L2 sums the
    sharded head weights with a psum)."""
    out = discriminator_forward_tp(
        d_params, tokens, cfg, axis_name=axis_name, dropout_key=dropout_key,
        post_highway_feature=True, softmax_pred=True,
    )
    logp = jax.nn.log_softmax(out["score"], axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    W, b = d_params["out"]["w"], d_params["out"]["b"]
    l2 = cfg.l2_reg_lambda * (jax.lax.psum(jnp.sum(W * W), axis_name) + jnp.sum(b * b))
    return ce + l2


def seqgan_dis_loss_tp(d_params, tokens, labels, cfg, dropout_key=None,
                       axis_name: str = "model"):
    """Model-parallel SeqGAN D loss (CE on the psum'd logits)."""
    out = discriminator_forward_tp(
        d_params, tokens, cfg, axis_name=axis_name, dropout_key=dropout_key,
    )
    logp = jax.nn.log_softmax(out["score"], axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def leakgan_forward_tp(d_params, tokens, cfg, *, dropout_key=None,
                       axis_name: str = "model"):
    """LeakGAN-contract TP forward (post-highway leaked feature, softmax
    pred) with the engine call signature — pass as the engines'
    ``d_forward`` so the in-scan feature leaks run model-parallel."""
    return discriminator_forward_tp(
        d_params, tokens, cfg, axis_name=axis_name, dropout_key=dropout_key,
        post_highway_feature=True, softmax_pred=True,
    )


# ---------------------------------------------------------------------------
# C-RNN-GAN: hidden-split bi-LSTM discriminator (parallel/rnn_tp.py cells)
# ---------------------------------------------------------------------------


def crnngan_d_specs() -> dict:
    """PartitionSpecs for a REPACKED C-RNN-GAN discriminator pytree
    (models/crnngan.init_discriminator structure after
    :func:`repack_crnngan_d`); the tiny per-step head stays replicated."""
    from music_tpu.parallel.rnn_tp import lstm_specs

    return {
        "fwd1": lstm_specs(), "bwd1": lstm_specs(),
        "fwd2": lstm_specs(), "bwd2": lstm_specs(),
        "out": {"w": P(), "b": P()},
    }


def repack_crnngan_d(params: dict, m: int) -> dict:
    """Gate-major repack of all four LSTMs (see rnn_tp.repack_lstm_params);
    inverse with :func:`unpack_crnngan_d` for layout-stable checkpoints."""
    from music_tpu.parallel.rnn_tp import repack_lstm_params

    out = {k: repack_lstm_params(v, m) for k, v in params.items() if k != "out"}
    out["out"] = params["out"]
    return out


def unpack_crnngan_d(params: dict, m: int) -> dict:
    """Inverse of :func:`repack_crnngan_d` (restores torch gate order)."""
    from music_tpu.parallel.rnn_tp import _gate_perm

    def inv(p):
        H = p["wh"].shape[0]
        iperm = np.argsort(_gate_perm(H, m))
        return {
            "wi": p["wi"][:, iperm], "wh": p["wh"][:, iperm],
            "bi": p["bi"][iperm], "bh": p["bh"][iperm],
        }

    out = {k: inv(v) for k, v in params.items() if k != "out"}
    out["out"] = params["out"]
    return out


def crnngan_forward_tp(params: dict, events, cfg, axis_name: str = "model",
                       meta=None):
    """Hidden-split bi-LSTM discriminator forward inside shard_map —
    numerically identical to models/crnngan.discriminator_forward on the
    un-repacked params.  One [B, H] psum per LSTM per timestep.
    ``meta``: conditional-D rows (replicated), appended per timestep."""
    from music_tpu.models.crnngan import condition_events
    from music_tpu.ops.rnn import linear
    from music_tpu.parallel.rnn_tp import lstm_cell_tp, lstm_zero_state_tp

    events = condition_events(events, meta, cfg)

    m = jax.lax.axis_size(axis_name)
    B = events.shape[0]
    H = cfg.hidden_dim

    def run(p_local, seq):  # seq [T, B, F]
        state = lstm_zero_state_tp(p_local, B, H, m, seq, seq.dtype)

        def step(carry, x_t):
            h, c = lstm_cell_tp(p_local, x_t, carry, axis_name)
            return (h, c), h

        _, hs = jax.lax.scan(step, state, seq)
        return hs  # [T, B, H] replicated

    def bilstm(fwd_p, bwd_p, xs):  # xs [B, T, F]
        seq = jnp.swapaxes(xs, 0, 1)
        fwd = run(fwd_p, seq)
        bwd = run(bwd_p, seq[::-1])[::-1]
        return jnp.swapaxes(jnp.concatenate([fwd, bwd], axis=-1), 0, 1)

    h = bilstm(params["fwd1"], params["bwd1"], events)
    h = bilstm(params["fwd2"], params["bwd2"], h)
    logits = linear(params["out"], h)[..., 0]
    return jax.nn.sigmoid(logits), h
