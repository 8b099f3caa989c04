"""LeakGAN: hierarchical Manager/Worker generator with leaked D features.

Reference: leak_gan/ — feature-leaking CNN discriminator (model.py:30-132),
Manager (LSTMCell over the 1720-d leaked feature -> L2-renormed sub-goal,
model.py:134-165), Worker (token LSTMCell -> [vocab, goal_size] matrix O,
model.py:167-202), generator step combining them (model.py:204-236), the
four recurrent engines (utils.py:29-414), rollout rewards with rank-based
rescale (utils.py:419-475), and the five losses (utils.py:491-561).

TPU-first redesign:

- Every engine ('pre', 'adv', 'rollout', 'gen') is ONE ``lax.scan``: the
  discriminator's feature extraction runs *inside* the scan step on the
  progressively-built padded prefix (the reference re-runs a Python-side D
  forward per token, utils.py:67-85).  The growing prefix lives in the scan
  carry as a fixed-shape [B, seq_len] buffer masked with the pad token.
- Rollout rewards batch all (rollout x restore-point) streams into one scan
  + one batched D pass (utils.py:419-459 runs them sequentially).
- Goal bookkeeping (reset every ``step_size``, last_goal accumulation,
  real_goal promotion — utils.py:92-100) is pure carry arithmetic.

Documented divergences (docs/DIVERGENCES.md):
- #7 pre_manager loss sign: the reference returns the *negated* cosine loss
  (utils.py:498-504), maximizing goal/feature divergence; we minimize it.
- #8 reward accumulation index: for rollout i>0 the reference writes
  ``rewards[given_num/step - 1]`` (utils.py:450), off by one vs the i==0
  append order; we use the intended column ``given_num/step``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.parallel.vma import varying_zero
from music_tpu.ops.rnn import (
    embedding_init,
    linear,
    linear_init,
    lstm_cell,
    lstm_init,
    lstm_zero_state,
)


@dataclasses.dataclass(frozen=True)
class LeakGanConfig:
    """leak_gan/params/leak_gan_params.json + dis filter spec."""

    vocab_size: int = 5258
    seq_len: int = 20
    step_size: int = 5
    goal_size: int = 16
    worker_emb_dim: int = 32
    worker_hidden: int = 32
    manager_hidden: int = 32
    start_token: int = 0
    temperature: float = 1.0
    dis_emb_dim: int = 64
    filter_sizes: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 15, 20)
    num_filters: tuple[int, ...] = (100, 200, 200, 200, 200, 100, 100, 100, 100, 100, 160, 160)
    dropout: float = 0.2
    l2_reg_lambda: float = 1e-5

    @property
    def goal_out_size(self) -> int:
        # goal_out_size = sum(num_filters) — leak_gan/train.py:45-49
        return sum(self.num_filters)

    @property
    def pad_token(self) -> int:
        # prefixes padded with vocab_size; D embedding has vocab+1 rows
        # (utils.py:75-78, model.py:67)
        return self.vocab_size

    @property
    def n_goals(self) -> int:
        return self.seq_len // self.step_size

    @classmethod
    def from_json(cls, leak_gan_params: dict) -> "LeakGanConfig":
        """Accepts the flat music_tpu schema AND the reference's nested
        one (leak_gan/params/leak_gan_params.json: discriminator_params /
        generator_params.{worker,manager}_params — train.py:35-49's
        cross-wiring of goal_out_size is the `goal_out_size` property)."""
        p = dict(leak_gan_params)
        d = p.get("discriminator_params", {})
        g = p.get("generator_params", {})
        w = g.get("worker_params", {})
        m = g.get("manager_params", {})

        def pick(*vals, default):
            for v in vals:
                if v is not None:
                    return v
            return default

        return cls(
            vocab_size=pick(p.get("vocab_size"), w.get("vocab_size"),
                            d.get("vocab_size"), default=5258),
            seq_len=pick(p.get("seq_len"), d.get("seq_len"), default=20),
            step_size=pick(p.get("step_size"), g.get("step_size"),
                           d.get("step_size"), default=5),
            goal_size=pick(p.get("goal_size"), w.get("goal_size"), default=16),
            worker_emb_dim=pick(p.get("embed_dim"), w.get("embed_dim"), default=32),
            worker_hidden=pick(p.get("hidden_dim"), w.get("hidden_dim"), default=32),
            manager_hidden=pick(p.get("hidden_dim"), m.get("hidden_dim"), default=32),
            start_token=pick(p.get("start_token"), d.get("start_token"), default=0),
            temperature=float(p.get("temperature", 1.0)),
            dis_emb_dim=pick(p.get("dis_emb_dim"), d.get("dis_emb_dim"), default=64),
            filter_sizes=tuple(pick(p.get("filter_sizes"), d.get("filter_sizes"),
                                    default=cls.filter_sizes)),
            num_filters=tuple(pick(p.get("num_filters"), d.get("num_filters"),
                                   default=cls.num_filters)),
            dropout=float(pick(p.get("dropout"),
                               1.0 - d["dropout_keep_prob"]
                               if "dropout_keep_prob" in d else None,
                               default=0.2)),
            l2_reg_lambda=float(pick(p.get("l2_reg_lambda"),
                                     d.get("l2_reg_lambda"), default=1e-5)),
        )


def _truncated_normal(key, shape, std=0.1):
    """scipy-truncnorm(-2std, 2std) init used throughout (model.py:8-15)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def renorm_unit_ball(x: jax.Array, maxnorm: float = 1.0, eps: float = 1e-12) -> jax.Array:
    """torch.renorm(x, p=2, dim=0, maxnorm): rows scaled down to the L2 ball
    (model.py:164, 230)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, maxnorm / jnp.maximum(n, eps))
    return x * scale


def cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """torch.nn.functional.cosine_similarity along the last axis."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


# ---------------------------------------------------------------------------
# Discriminator (feature-leaking CNN)
# ---------------------------------------------------------------------------


def init_discriminator(key: jax.Array, cfg: LeakGanConfig) -> dict:
    n = len(cfg.filter_sizes)
    ks = jax.random.split(key, n + 5)
    convs = []
    for i, (fs, nf) in enumerate(zip(cfg.filter_sizes, cfg.num_filters)):
        convs.append(
            {
                "w": _truncated_normal(ks[i], (fs, cfg.dis_emb_dim, nf)),
                "b": jnp.full((nf,), 0.1),
            }
        )
    F = cfg.goal_out_size
    return {
        "embed": _truncated_normal(ks[n], (cfg.vocab_size + 1, cfg.dis_emb_dim)),
        "convs": convs,
        "highway_h": linear_init(ks[n + 1], F, F),
        "highway_t": linear_init(ks[n + 2], F, F),
        "out": linear_init(ks[n + 3], F, 2),
    }


def discriminator_forward(
    params: dict,
    tokens: jax.Array,
    cfg: LeakGanConfig,
    *,
    dropout_key: jax.Array | None = None,
):
    """Returns {pred (softmax probs [B,2]), feature [B,1720], score [B,2]}.

    The leaked feature is taken AFTER highway + dropout, matching
    model.py:118-125 (unlike SeqGAN's pre-highway features).
    """
    x = jnp.take(params["embed"], tokens, axis=0)  # [B, T, E]
    feats = []
    T = x.shape[1]
    for conv in params["convs"]:
        fs = conv["w"].shape[0]
        acc = None
        for k in range(fs):
            xs = jax.lax.slice_in_dim(x, k, T - fs + 1 + k, axis=1)
            term = jnp.einsum("bte,ef->btf", xs, conv["w"][k])
            acc = term if acc is None else acc + term
        acc = jax.nn.relu(acc + conv["b"])
        feats.append(jnp.max(acc, axis=1))
    f = jnp.concatenate(feats, axis=-1)
    h = jax.nn.relu(linear(params["highway_h"], f))
    t = jax.nn.sigmoid(linear(params["highway_t"], f))
    f = t * h + (1.0 - t) * f
    if dropout_key is not None and cfg.dropout > 0:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_key, keep, f.shape)
        f = jnp.where(mask, f / keep, 0.0)
    score = linear(params["out"], f)
    return {"pred": jax.nn.softmax(score, axis=-1), "feature": f, "score": score}


def discriminator_l2(params: dict, cfg: LeakGanConfig) -> jax.Array:
    """L2 penalty on the final layer only (model.py:127-132)."""
    W, b = params["out"]["w"], params["out"]["b"]
    return cfg.l2_reg_lambda * (jnp.sum(W * W) + jnp.sum(b * b))


# ---------------------------------------------------------------------------
# Manager / Worker / Generator
# ---------------------------------------------------------------------------


def init_generator(key: jax.Array, cfg: LeakGanConfig, batch_size: int) -> dict:
    """Manager + Worker parameter pytree (std-0.1 normal init,
    model.py:154-159, 191-193; goal_init truncated-normal per batch row)."""
    ks = jax.random.split(key, 8)
    G = cfg.goal_out_size
    nrm = lambda k, shape: 0.1 * jax.random.normal(k, shape)

    def nrm_tree(k, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        subs = jax.random.split(k, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [nrm(sk, leaf.shape) for sk, leaf in zip(subs, leaves)]
        )

    # reference inits every Manager/Worker parameter N(0, 0.1)
    # (model.py:154-156, 191-193); goal_init is truncated-normal (:157-159)
    manager = {
        "lstm": nrm_tree(ks[0], lstm_init(ks[0], G, cfg.manager_hidden)),
        "fc": nrm_tree(ks[1], linear_init(ks[1], cfg.manager_hidden, G)),
        "goal_init": _truncated_normal(ks[2], (batch_size, G)),
    }
    worker = {
        "embed": nrm(ks[3], (cfg.vocab_size, cfg.worker_emb_dim)),
        "lstm": nrm_tree(ks[4], lstm_init(ks[4], cfg.worker_emb_dim, cfg.worker_hidden)),
        "fc": nrm_tree(ks[5], linear_init(ks[5], cfg.worker_hidden, cfg.goal_size * cfg.vocab_size)),
        "goal_change": nrm(ks[6], (G, cfg.goal_size)),
    }
    return {"manager": manager, "worker": worker}


def generator_step(
    g_params: dict,
    x_t: jax.Array,
    f_t: jax.Array,
    state: dict,
    cfg: LeakGanConfig,
    key: jax.Array,
    temperature: float,
):
    """One generator step (model.py:222-236): Manager sub-goal from the
    leaked feature, Worker logits via the goal-projected O matrix,
    categorical sample of the next token.

    ``state``: dict(h_m, c_m, h_w, c_w, last_goal, real_goal).
    Returns (sampled token [B], probs [B, V], sub_goal [B, G], new_state).
    """
    B = x_t.shape[0]
    h_m, c_m = lstm_cell(g_params["manager"]["lstm"], f_t, (state["h_m"], state["c_m"]))
    sub_goal = renorm_unit_ball(linear(g_params["manager"]["fc"], h_m))

    x_emb = jnp.take(g_params["worker"]["embed"], x_t, axis=0)
    h_w, c_w = lstm_cell(g_params["worker"]["lstm"], x_emb, (state["h_w"], state["c_w"]))
    O = linear(g_params["worker"]["fc"], h_w).reshape(B, cfg.vocab_size, cfg.goal_size)

    w_t = renorm_unit_ball(state["real_goal"] @ g_params["worker"]["goal_change"])  # [B, gs]
    logits = jnp.einsum("bvg,bg->bv", O, w_t)
    # LeakGAN multiplies logits by its temperature (model.py:233)
    probs = jax.nn.softmax(temperature * logits, axis=-1)
    sampled = jax.random.categorical(key, temperature * logits, axis=-1).astype(jnp.int32)

    new_state = dict(
        state,
        h_m=h_m, c_m=c_m, h_w=h_w, c_w=c_w,
        last_goal=state["last_goal"] + sub_goal,
    )
    return sampled, probs, sub_goal, new_state


def _init_gen_state(
    g_params: dict, batch: int, cfg: LeakGanConfig, goal_init_rows=None
) -> dict:
    h_w, c_w = lstm_zero_state(batch, cfg.worker_hidden)
    h_m, c_m = lstm_zero_state(batch, cfg.manager_hidden)
    if goal_init_rows is None:
        goal_init_rows = g_params["manager"]["goal_init"][:batch]
    return {
        "h_m": h_m, "c_m": c_m, "h_w": h_w, "c_w": c_w,
        "last_goal": jnp.zeros((batch, cfg.goal_out_size)),
        "real_goal": goal_init_rows,
    }


def _apply_goal_reset(state: dict, t: jax.Array, cfg: LeakGanConfig) -> dict:
    """utils.py:92-100: at t % step_size == 0, promote the accumulated
    last_goal to real_goal (except t=0, which keeps goal_init) and zero the
    accumulator."""
    is_reset = (t % cfg.step_size) == 0
    promote = jnp.logical_and(is_reset, t > 0)
    real_goal = jnp.where(promote, state["last_goal"], state["real_goal"])
    last_goal = jnp.where(is_reset, jnp.zeros_like(state["last_goal"]), state["last_goal"])
    return dict(state, real_goal=real_goal, last_goal=last_goal)


def _engine_scan(
    g_params: dict,
    d_params: dict,
    cfg: LeakGanConfig,
    key: jax.Array,
    batch: int,
    *,
    n_steps: int,
    teacher_tokens: jax.Array | None = None,
    teacher_until: jax.Array | None = None,
    real_prefix: jax.Array | None = None,
    temperature: float = 1.0,
    dropout_key: jax.Array | None = None,
    goal_init_rows=None,
    d_forward=None,
):
    """The unified recurrent engine (covers 'pre'/'adv'/'rollout'/'gen').

    Per step t: D feature on the current padded prefix -> generator step ->
    goal reset bookkeeping -> emit (f_t, probs, sampled/teacher token,
    real_goal after reset).

    - ``teacher_tokens`` + ``teacher_until``: the emitted token at position
      t is ``teacher_tokens[:, t]`` while ``t < teacher_until`` (rollout
      mode; per-STREAM boundary so rollout streams batch together).
    - ``real_prefix``: 'pre' mode — the D prefix comes from this data
      regardless of sampled tokens (utils.py:70-79), while the worker
      free-runs on its own samples (the reference's actual behavior).
    - ``d_forward``: discriminator forward override — the model-parallel
      trainer passes the TP split (parallel/gan_tp.leakgan_forward_tp) so
      the in-scan feature leaks run on model-sharded D params.
    """
    if d_forward is None:
        d_forward = discriminator_forward
    state = _init_gen_state(g_params, batch, cfg, goal_init_rows)
    # shard_map device-variance workaround (parallel/vma.py): carries must
    # share the scanned keys' data-axis-varying status under shard_map.
    jitter_i = varying_zero(key, jnp.int32)
    jitter_f = varying_zero(key, jnp.float32)
    state = {
        k: (v + jitter_f if jnp.issubdtype(v.dtype, jnp.floating) else v)
        for k, v in state.items()
    }
    buf0 = jnp.full((batch, cfg.seq_len), cfg.pad_token, jnp.int32) + jitter_i
    keys = jax.random.split(key, n_steps)
    dkeys = (
        jax.random.split(dropout_key, n_steps)
        if dropout_key is not None
        else [None] * n_steps
    )
    dkeys = jnp.stack(dkeys) if dropout_key is not None else None
    pos = jnp.arange(cfg.seq_len)

    def step(carry, scan_in):
        state, buf, x_t = carry
        t, key_t, dk = scan_in
        prefix = buf
        if real_prefix is not None:
            # teacher D-prefix: real data tokens < t, pad elsewhere
            prefix = jnp.where(pos[None, :] < t, real_prefix, cfg.pad_token)
        f_t = d_forward(d_params, prefix, cfg, dropout_key=dk)["feature"]
        sampled, probs, sub_goal, state2 = generator_step(
            g_params, x_t, f_t, state, cfg, key_t, temperature
        )
        state2 = _apply_goal_reset(state2, t, cfg)
        if teacher_tokens is not None:
            in_prefix = t < teacher_until  # per-stream restore point
            tok_t = jnp.where(in_prefix, teacher_tokens[:, t], sampled)
        else:
            tok_t = sampled
        tok_valid = t < cfg.seq_len
        buf2 = jnp.where(
            jnp.logical_and(pos[None, :] == t, tok_valid), tok_t[:, None], buf
        )
        out = {
            "feature": f_t,
            "probs": probs,
            "token": tok_t,
            "real_goal": state2["real_goal"],
        }
        return (state2, buf2, tok_t), out

    x0 = jnp.full((batch,), cfg.start_token, jnp.int32) + jitter_i
    scan_in = (jnp.arange(n_steps), keys, dkeys) if dkeys is not None else (
        jnp.arange(n_steps), keys, jnp.zeros((n_steps,), jnp.int32))
    if dkeys is None:
        def step_nodrop(carry, sin):
            t, key_t, _ = sin
            return step(carry, (t, key_t, None))
        (_, buf, _), outs = jax.lax.scan(step_nodrop, (state, buf0, x0), scan_in)
    else:
        (_, buf, _), outs = jax.lax.scan(step, (state, buf0, x0), scan_in)
    return buf, outs


# ---------------------------------------------------------------------------
# The four public engines (utils.py:29-417)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "d_forward"))
def pre_engine(g_params, d_params, real_data, key, *, cfg: LeakGanConfig, dropout_key=None, d_forward=None):
    """'pre' (utils.py:38-130): teacher D-prefixes from real data; returns
    real_goal [B, n_goals, G], prediction [B, T, V], delta_feature
    [B, n_goals, G]."""
    B = real_data.shape[0]
    _, outs = _engine_scan(
        g_params, d_params, cfg, key, B,
        n_steps=cfg.seq_len + 1,
        real_prefix=real_data,
        dropout_key=dropout_key,
        d_forward=d_forward,
    )
    return _pre_adv_post(outs, cfg)


def _pre_adv_post(outs, cfg: LeakGanConfig):
    feats = outs["feature"]            # [T+1, B, G]
    k = cfg.step_size
    n = cfg.n_goals
    # delta_feature[j] = f_{(j+1)k} - f_{jk}  (utils.py:107-111)
    delta = jnp.stack([feats[(j + 1) * k] - feats[j * k] for j in range(n)], axis=1)
    # real_goal snapshots at reset steps t = 0, k, ..., (n-1)k (post-reset)
    real_goal = jnp.stack([outs["real_goal"][j * k] for j in range(n)], axis=1)
    prediction = jnp.swapaxes(outs["probs"][: cfg.seq_len], 0, 1)  # [B, T, V]
    return {"real_goal": real_goal, "prediction": prediction, "delta_feature": delta}


@functools.partial(jax.jit, static_argnames=("cfg", "batch", "temperature", "d_forward"))
def adv_engine(g_params, d_params, key, batch: int, *, cfg: LeakGanConfig,
               temperature: float = 1.0, dropout_key=None, d_forward=None):
    """'adv' (utils.py:132-244): free-running; additionally returns
    all_goal [B, T, G], delta_feature_for_worker [B, T, G], gen_token [B, T]."""
    tokens, outs = _engine_scan(
        g_params, d_params, cfg, key, batch,
        n_steps=cfg.seq_len + 1,
        temperature=temperature,
        dropout_key=dropout_key,
        d_forward=d_forward,
    )
    rets = _pre_adv_post(outs, cfg)
    feats = outs["feature"]  # [T+1, B, G]
    k = cfg.step_size
    # worker deltas at t=1..T: f_t - f_{t - (t%k or k)}  (utils.py:203-216)
    deltas = []
    for t in range(1, cfg.seq_len + 1):
        base = t - (t % k if t % k != 0 else k)
        deltas.append(feats[t] - feats[base])
    rets["delta_feature_for_worker"] = jnp.stack(deltas, axis=1)
    # all_goal[t-1] = real_goal after step t's reset, t = 1..T
    rets["all_goal"] = jnp.swapaxes(outs["real_goal"][1:], 0, 1)
    rets["gen_token"] = tokens  # [B, T] — tokens 0..T-1 (utils.py:225-227)
    return rets


@functools.partial(jax.jit, static_argnames=("cfg", "batch", "temperature", "d_forward"))
def gen_samples(g_params, d_params, key, batch: int, *, cfg: LeakGanConfig,
                temperature: float = 1.0, d_forward=None):
    """'gen' (utils.py:375-414): pure sampling of [batch, seq_len] tokens."""
    tokens, _ = _engine_scan(
        g_params, d_params, cfg, key, batch, n_steps=cfg.seq_len,
        temperature=temperature, d_forward=d_forward,
    )
    return tokens


def rescale_rewards(sums, *, delta: float = 16.0, axis_name: str | None = None):
    """Rank-based reward rescale across the batch (utils.py:461-475):
    ``sigmoid(delta * (0.5 - rank/B))`` with rank 1 = highest score.

    Under a data-sharded mesh, pass ``axis_name``: per-shard score columns
    are ``all_gather``ed over that axis so ranks are computed over the
    GLOBAL batch — exactly the reference's single-batch semantics — and the
    local shard's column slice is returned.  Without the gather, dp would
    rank within each shard's sub-batch, materially flattening the reward
    distribution (e.g. ranking 8 sequences instead of 64 at dp=8)."""
    if axis_name is None:
        full = sums
    else:
        full = jax.lax.all_gather(sums, axis_name, axis=1, tiled=True)
    B = full.shape[1]
    order = jnp.argsort(full, axis=1)
    rank = jnp.argsort(order, axis=1)
    rank = B - rank
    rescaled = jax.nn.sigmoid(delta * (0.5 - rank.astype(jnp.float32) / B))
    if axis_name is not None:
        b_local = sums.shape[1]
        start = jax.lax.axis_index(axis_name) * b_local
        rescaled = jax.lax.dynamic_slice_in_dim(rescaled, start, b_local, axis=1)
    return rescaled


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rollout_num", "temperature", "axis_name", "d_forward"),
)
def get_rewards(
    g_params, d_params, input_x, key, *, cfg: LeakGanConfig,
    rollout_num: int = 4, temperature: float = 1.0, delta: float = 16.0,
    axis_name: str | None = None, d_forward=None,
):
    """Rollout rewards [B, n_goals] (utils.py:419-459): for each restore
    point given_num = 0, k, 2k, ..., regenerate completions rollout_num
    times, score P(real), rank-rescale across the batch (utils.py:461-475),
    divide by rollout_num.  All (rollout x restore) streams run in ONE scan.

    ``axis_name``: name of the data mesh axis when called inside shard_map —
    the rank rescale then operates on the all_gathered global batch.
    """
    B, T = input_x.shape
    R = rollout_num
    n = cfg.n_goals  # restore points 0, k, ..., (n-1)k
    N = R * n * B

    given = jnp.broadcast_to(
        (jnp.arange(n) * cfg.step_size)[None, :, None], (R, n, B)
    ).reshape(-1)
    teacher = jnp.broadcast_to(input_x[None, None], (R, n, B, T)).reshape(N, T)
    # each stream (r, k, b) uses batch row b's learned goal_init
    gi = g_params["manager"]["goal_init"][:B]
    gi = jnp.broadcast_to(gi[None, None], (R, n, B, gi.shape[-1])).reshape(N, -1)

    completions, _ = _engine_scan(
        g_params, d_params, cfg, key, N,
        n_steps=cfg.seq_len,
        teacher_tokens=teacher,
        teacher_until=given,
        temperature=temperature,
        goal_init_rows=gi,
        d_forward=d_forward,
    )
    if d_forward is None:
        d_forward = discriminator_forward
    pred = d_forward(d_params, completions, cfg)["pred"][:, 1]  # [N]
    sums = pred.reshape(R, n, B).sum(axis=0)  # [n, B]
    # rank-based rescale per restore point, over the global batch under dp
    rescaled = rescale_rewards(sums, delta=delta, axis_name=axis_name)
    return rescaled.T / rollout_num  # [B, n]


# ---------------------------------------------------------------------------
# Losses (utils.py:491-561)
# ---------------------------------------------------------------------------


def pre_manager_loss(real_goal, delta_feature):
    """mean(1 - cos(goal, delta-f)) — intended sign (divergence #7 vs
    utils.py:498-504 which returns the negation)."""
    return jnp.mean(1.0 - cosine_similarity(real_goal, delta_feature))


def pre_worker_loss(real_data, prediction, vocab_size):
    """-mean(onehot(real) * log clamp(probs)) over all elements
    (utils.py:506-514)."""
    p = jnp.clip(prediction, 1e-20, 1.0)
    logp = jnp.log(p)
    picked = jnp.take_along_axis(logp, real_data[..., None], axis=-1)
    # reference means over B*T*V (the one-hot zeros dilute) — keep exact
    return -jnp.sum(picked) / np.prod(prediction.shape)


def adv_manager_loss(rewards, real_goal, delta_feature):
    """-mean(reward * (1 - cos)) (utils.py:516-524)."""
    return -jnp.mean(rewards * (1.0 - cosine_similarity(delta_feature, real_goal)))


def adv_worker_loss(all_goal, delta_feature_for_worker, gen_token, prediction, vocab_size):
    """-mean(intrinsic * sum_v onehot * log p) (utils.py:526-538)."""
    intrinsic = 1.0 - cosine_similarity(all_goal, delta_feature_for_worker)  # [B,T]
    p = jnp.clip(prediction, 1e-20, 1.0)
    picked = jnp.take_along_axis(jnp.log(p), gen_token[..., None], axis=-1)[..., 0]
    return -jnp.mean(intrinsic * picked)


def dis_loss(d_params, tokens, labels, cfg: LeakGanConfig, dropout_key=None):
    """CE + final-layer L2 (utils.py:540-558, model.py:127-132)."""
    out = discriminator_forward(d_params, tokens, cfg, dropout_key=dropout_key)
    logp = jax.nn.log_softmax(out["score"], axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    return ce + discriminator_l2(d_params, cfg)
