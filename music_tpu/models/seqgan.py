"""SeqGAN: LSTM generator + CNN discriminator + Monte-Carlo rollout rewards.

Reference: SeqGan_Pytorch/ — G_LSTM (generator.py:14-52), free-running
sampler (generator.py:62-106), 12-filter CNN discriminator with highway
(discriminator.py), MC rollout rewards (rollout.py:20-51), GAN engine
(seqgan.py).

TPU-first redesign:

- Generator teacher-forced pass and sampler are ``lax.scan``s over fused
  LSTM-gate GEMMs (music_tpu/ops/rnn.py); no per-token Python.
- Discriminator's 12 parallel convs run as width-f valid convolutions over
  channels-last embeddings — each a batched GEMM stack XLA tiles onto the
  MXU; max-over-time + highway + logits as in the reference's architecture.
- **The rollout engine is one device program** (the reference runs
  16 rollouts x 19 prefixes x (Python generate + D forward) per G step,
  rollout.py:29-48 — ~304 sequential model invocations).  Here: teacher-
  force ONCE to get LSTM states at every prefix, then free-run ALL
  (batch x prefix x rollout) continuations in a single scan, then score all
  completions with ONE batched D forward.  Wall-clock becomes one fused
  kernel launch — this is the >=20x BASELINE target's mechanism.

Documented divergences from reference bugs (docs/DIVERGENCES.md):
- #4 the reference's highway layer creates fresh untrained nn.Linear
  modules every forward (discriminator.py:29-35); ours is a real parameter.
- #5 sampling uses true categorical probabilities, not
  ``multinomial(-log p)`` weights (generator.py:80).
- #6 the PG loss descends (reference's G_loss returns +sum log p * reward
  and then calls backward() on it, ascending the wrong way, seqgan.py:109-120).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

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
    lstm_scan,
    lstm_zero_state,
)

# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """SeqGan_Pytorch/train.py:22-33 hyperparameters."""

    vocab_size: int = 5000
    emb_dim: int = 32
    hidden_dim: int = 32
    seq_len: int = 20
    start_token: int = 0


def init_generator(key: jax.Array, cfg: GeneratorConfig, emb_std: float = 1.0,
                   init: str = "torch") -> dict:
    """``init="torch"``: module-default inits (N(0,1) embedding, U(±1/sqrt(H))
    LSTM/fc — what a fresh G_LSTM gets, SeqGan_Pytorch/generator.py:14-29).
    ``init="normal"``: EVERY parameter N(0,1) — the target-LSTM oracle init
    (leak_gan/target.py:30-32), whose peaked conditionals give the
    oracle-NLL metric room to register quality (a near-uniform torch-init
    oracle pins NLL at its ln(V) entropy floor)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embed": embedding_init(k1, cfg.vocab_size, cfg.emb_dim, std=emb_std),
        "lstm": lstm_init(k2, cfg.emb_dim, cfg.hidden_dim, init=init),
        "out": linear_init(k3, cfg.hidden_dim, cfg.vocab_size, init=init),
    }


def generator_logits(params: dict, tokens: jax.Array, cfg: GeneratorConfig):
    """Teacher-forced logits.  tokens [B, T] -> logits [B, T, V]: position t
    predicts token t given tokens < t (input sequence is start-token-shifted,
    matching g_data_loader's (x, y) pairing, data_utils.py:13-22)."""
    B, T = tokens.shape
    start = jnp.full((B, 1), cfg.start_token, tokens.dtype)
    inputs = jnp.concatenate([start, tokens[:, :-1]], axis=1)
    xs = jnp.take(params["embed"], inputs, axis=0)
    hs, _ = lstm_scan(params["lstm"], xs)
    return linear(params["out"], hs)


def generator_nll(params: dict, tokens: jax.Array, cfg: GeneratorConfig) -> jax.Array:
    """Mean per-token NLL (the MLE pretraining loss, seqgan.py:20-37; also
    the oracle-NLL metric when ``params`` is the oracle, target-LSTM style)."""
    logits = generator_logits(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)
    return jnp.mean(nll)


@functools.partial(jax.jit, static_argnames=("cfg", "batch"))
def generate(params: dict, key: jax.Array, cfg: GeneratorConfig, batch: int) -> jax.Array:
    """Free-running sampling of [batch, seq_len] sequences — one scan
    (reference: per-token Python loop, generator.py:62-88)."""
    # shard_map device-variance workaround (parallel/vma.py): carries must
    # share the per-shard key's data-axis-varying status under shard_map.
    jitter_i = varying_zero(key, jnp.int32)
    jitter_f = varying_zero(key, jnp.float32)
    h0, c0 = lstm_zero_state(batch, cfg.hidden_dim)
    h0, c0 = h0 + jitter_f, c0 + jitter_f
    tok0 = jnp.full((batch,), cfg.start_token, jnp.int32) + jitter_i

    def step(carry, key_t):
        (h, c), tok = carry
        x = jnp.take(params["embed"], tok, axis=0)
        h, c = lstm_cell(params["lstm"], x, (h, c))
        logits = linear(params["out"], h)
        nxt = jax.random.categorical(key_t, logits, axis=-1).astype(jnp.int32)
        return ((h, c), nxt), nxt

    keys = jax.random.split(key, cfg.seq_len)
    _, toks = jax.lax.scan(step, ((h0, c0), tok0), keys)
    return toks.T  # [batch, seq_len]


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """SeqGan_Pytorch/train.py:36-46 (12 filter sizes, 1720 total filters)."""

    vocab_size: int = 5000
    emb_dim: int = 64
    filter_sizes: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 15, 20)
    num_filters: tuple[int, ...] = (100, 200, 200, 200, 200, 100, 100, 100, 100, 100, 160, 160)
    seq_len: int = 20
    dropout: float = 0.25

    @property
    def feature_dim(self) -> int:
        return sum(self.num_filters)


def init_discriminator(key: jax.Array, cfg: DiscriminatorConfig) -> dict:
    n = len(cfg.filter_sizes)
    ks = jax.random.split(key, n + 4)
    convs = []
    for i, (fs, nf) in enumerate(zip(cfg.filter_sizes, cfg.num_filters)):
        bound = 1.0 / np.sqrt(fs * cfg.emb_dim)
        convs.append(
            {
                "w": jax.random.uniform(ks[i], (fs, cfg.emb_dim, nf), jnp.float32, -bound, bound),
                "b": jnp.zeros((nf,)),
            }
        )
    F = cfg.feature_dim
    return {
        "embed": embedding_init(ks[n], cfg.vocab_size, cfg.emb_dim),
        "convs": convs,
        # real, trained highway (divergence #4 vs discriminator.py:29-35)
        "highway_h": linear_init(ks[n + 1], F, F),
        "highway_t": linear_init(ks[n + 2], F, F),
        "out": linear_init(ks[n + 3], F, 2),
    }


def discriminator_features(params: dict, tokens: jax.Array, cfg: DiscriminatorConfig):
    """Conv -> relu -> max-over-time feature vector [B, feature_dim]
    (the f_t that LeakGAN leaks; discriminator.py:63-85)."""
    x = jnp.take(params["embed"], tokens, axis=0)  # [B, T, E]
    feats = []
    for conv in params["convs"]:
        fs = conv["w"].shape[0]
        # valid conv width fs as fs shifted GEMMs (music_tpu.ops.conv idiom)
        T = x.shape[1]
        acc = None
        for k in range(fs):
            xs = jax.lax.slice_in_dim(x, k, T - fs + 1 + k, axis=1)
            term = jnp.einsum("bte,ef->btf", xs, conv["w"][k])
            acc = term if acc is None else acc + term
        acc = jax.nn.relu(acc + conv["b"])
        feats.append(jnp.max(acc, axis=1))  # max over time
    return jnp.concatenate(feats, axis=-1)


def discriminator_forward(
    params: dict,
    tokens: jax.Array,
    cfg: DiscriminatorConfig,
    *,
    dropout_key: jax.Array | None = None,
):
    """Returns dict(pred=log-probs [B,2], feature=[B,F], score=logits [B,2])
    — the reference's output contract (leak_gan/model.py:97-125 uses the
    same structure)."""
    f = discriminator_features(params, tokens, cfg)
    h = jax.nn.relu(linear(params["highway_h"], f))
    t = jax.nn.sigmoid(linear(params["highway_t"], f))
    hw = t * h + (1.0 - t) * f
    if dropout_key is not None and cfg.dropout > 0:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_key, keep, hw.shape)
        hw = jnp.where(mask, hw / keep, 0.0)
    score = linear(params["out"], hw)
    return {"pred": jax.nn.log_softmax(score, axis=-1), "feature": f, "score": score}


def discriminator_pos_prob(params: dict, tokens: jax.Array, cfg: DiscriminatorConfig):
    """P(real) per sequence — the reward signal (discriminator.py:97-100;
    class 1 = real, matching d_data_loader labels, data_utils.py:24-36)."""
    score = discriminator_forward(params, tokens, cfg)["score"]
    return jax.nn.softmax(score, axis=-1)[:, 1]


def discriminator_loss(
    params: dict,
    tokens: jax.Array,
    labels: jax.Array,
    cfg: DiscriminatorConfig,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    out = discriminator_forward(params, tokens, cfg, dropout_key=dropout_key)
    logp = jax.nn.log_softmax(out["score"], axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


# ---------------------------------------------------------------------------
# Rollout rewards + policy gradient
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("g_cfg", "d_cfg", "rollout_num", "pos_prob_fn")
)
def rollout_rewards(
    g_params: dict,
    d_params: dict,
    samples: jax.Array,
    key: jax.Array,
    *,
    g_cfg: GeneratorConfig,
    d_cfg: DiscriminatorConfig,
    rollout_num: int = 16,
    pos_prob_fn=None,
) -> jax.Array:
    """MC rewards [B, T]: for prefix length t in [1, T), the mean D-score of
    ``rollout_num`` free-running completions; position T-1 scored on the
    sample itself (rollout.py:20-51 semantics, fully batched).

    One teacher-forced scan captures the LSTM state at every prefix; then a
    single scan free-runs all (rollout, prefix, batch) continuations; one
    batched D forward scores everything.
    """
    B, T = samples.shape
    R = rollout_num
    n_prefix = T - 1  # prefix lengths 1..T-1
    N = R * n_prefix * B

    # Every stream starts from s_1 (the state that emits token 1, i.e. after
    # consuming [start, samples[:, 0]]) and scans positions p = 1..T-1: a
    # stream with prefix length t is teacher-forced (fed the sample's token)
    # while p < t and free-running for p >= t.  Teacher-forcing from s_1
    # reproduces the prefix state at the fork exactly, so no per-prefix
    # state gathering is needed — one uniform scan covers all 304 of the
    # reference's sequential rollouts.
    start = jnp.full((B,), g_cfg.start_token, samples.dtype)
    s0 = lstm_cell(
        g_params["lstm"],
        jnp.take(g_params["embed"], start, axis=0),
        lstm_zero_state(B, g_cfg.hidden_dim),
    )
    s1 = lstm_cell(
        g_params["lstm"], jnp.take(g_params["embed"], samples[:, 0], axis=0), s0
    )
    h0 = jnp.broadcast_to(s1[0], (R * n_prefix,) + s1[0].shape).reshape(N, -1)
    c0 = jnp.broadcast_to(s1[1], (R * n_prefix,) + s1[1].shape).reshape(N, -1)

    prefix_len = jnp.broadcast_to(
        jnp.arange(1, T)[None, :, None], (R, n_prefix, B)
    ).reshape(-1)
    sample_rep = jnp.broadcast_to(samples[None, None], (R, n_prefix, B, T)).reshape(N, T)

    def gen_step(carry, scan_in):
        h, c = carry
        p, key_p = scan_in
        logits = linear(g_params["out"], h)
        sampled = jax.random.categorical(key_p, logits, axis=-1).astype(jnp.int32)
        tok_p = jnp.where(p >= prefix_len, sampled, sample_rep[:, p])
        x = jnp.take(g_params["embed"], tok_p, axis=0)
        h, c = lstm_cell(g_params["lstm"], x, (h, c))
        return (h, c), tok_p

    keys = jax.random.split(key, n_prefix)
    _, toks = jax.lax.scan(gen_step, (h0, c0), (jnp.arange(1, T), keys))
    completions = jnp.concatenate(
        [sample_rep[:, :1], jnp.swapaxes(toks, 0, 1)], axis=1
    )  # [N, T]

    # pluggable scorer: the model-parallel trainer passes the TP forward
    # (parallel/gan_tp.py) so sharded D params score the completions
    score = pos_prob_fn or (lambda p, t: discriminator_pos_prob(p, t, d_cfg))
    probs = score(d_params, completions)  # [N]
    rewards_mc = probs.reshape(R, n_prefix, B).mean(axis=0)  # [n_prefix, B]
    final = score(d_params, samples)  # [B]
    return jnp.concatenate([rewards_mc.T, final[:, None]], axis=1)  # [B, T]


def pg_loss(
    g_params: dict, samples: jax.Array, rewards: jax.Array, cfg: GeneratorConfig
) -> jax.Array:
    """Policy-gradient surrogate: -mean(log pi(y_t | .) * reward_t)
    (intended behavior of seqgan.py:109-120; divergence #6 fixes the sign)."""
    logits = generator_logits(g_params, samples, cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(logp, samples[..., None], axis=-1)[..., 0]
    return -jnp.mean(chosen * rewards)
