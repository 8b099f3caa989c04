"""C-RNN-GAN: continuous LSTM GAN over MIDI note events.

The reference subproject is UNFINISHED: the generator references
nonexistent attributes (c-rnn-gan/model.py:65,94), the train loop is a stub
(train.py:50-66) and generate.py is empty (SURVEY.md §2.4).  Per
docs/DIVERGENCES.md #15 this module is built to the *intended* design —
the C-RNN-GAN paper (Mogren 2016) the reference clearly follows:

- **Generator**: per step, concat(uniform noise, previous output) -> fc1 +
  ReLU -> 2 stacked LSTM cells -> fc2 -> 4-feature event (duration delta /
  length / freq / velocity).  Teacher-forces real events during pretraining
  (model.py:93-98's intent).
- **Discriminator**: 2-layer bidirectional LSTM -> per-timestep linear ->
  sigmoid decisions; also returns per-step features for the paper's
  feature-matching generator loss (model.py:104-137's intent).
- **Losses**: BCE per timestep for D; G trains either adversarially
  (-log D(fake)) or by feature matching (MSE of mean D features) — the
  paper's remedy when D saturates; MSE regression pretraining.

All sequence processing is ``lax.scan``; generation is one scan carrying
(noise, prev-event, LSTM states).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from music_tpu.ops.rnn import linear, linear_init, lstm_cell, lstm_init, lstm_zero_state
from music_tpu.parallel.vma import varying_zero

NUM_FEATURES = 4


@dataclasses.dataclass(frozen=True)
class CRnnGanConfig:
    """c-rnn-gan/params/crnngan_params.json schema.

    ``meta_dim``: width of the per-song genre+composer one-hot conditioning
    tensor (c-rnn-gan/data.py:151-157, via
    :func:`music_tpu.data.midi.build_meta_onehots`); 0 = unconditioned."""

    num_song_features: int = NUM_FEATURES
    noise_dim: int = 100
    hidden_dim: int = 350
    song_length: int = 100
    meta_dim: int = 0

    @classmethod
    def from_json(cls, cfg: dict) -> "CRnnGanConfig":
        return cls(
            num_song_features=cfg.get("num_song_features", NUM_FEATURES),
            noise_dim=cfg.get("noise_dim", cfg.get("random_input_dim", 100)),
            hidden_dim=cfg.get("hidden_dim", 350),
            song_length=cfg.get("song_length", 100),
            meta_dim=cfg.get("meta_dim", 0),
        )


def init_generator(key: jax.Array, cfg: CRnnGanConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    H, F = cfg.hidden_dim, cfg.num_song_features
    return {
        "fc1": linear_init(k1, cfg.noise_dim + F + cfg.meta_dim, H),
        "lstm1": lstm_init(k2, H, H),
        "lstm2": lstm_init(k3, H, H),
        "fc2": linear_init(k4, H, F),
    }


def init_discriminator(key: jax.Array, cfg: CRnnGanConfig) -> dict:
    ks = jax.random.split(key, 5)
    H, F = cfg.hidden_dim, cfg.num_song_features
    # conditional GAN: when meta_dim > 0 the D consumes the genre/composer
    # one-hot alongside each event (without this, the adversarial phase has
    # no incentive to honor the condition the generator was given — fooling
    # an unconditioned D collapses conditioning; benchmarks/crnngan_quality_run)
    return {
        "fwd1": lstm_init(ks[0], F + cfg.meta_dim, H),
        "bwd1": lstm_init(ks[1], F + cfg.meta_dim, H),
        "fwd2": lstm_init(ks[2], 2 * H, H),
        "bwd2": lstm_init(ks[3], 2 * H, H),
        "out": linear_init(ks[4], 2 * H, 1),
    }


def _g_step(params: dict, noise_t, prev_out, meta, state):
    (h1, c1), (h2, c2) = state
    parts = [noise_t, prev_out] + ([meta] if meta is not None else [])
    x = jnp.concatenate(parts, axis=-1)
    x = jax.nn.relu(linear(params["fc1"], x))
    h1, c1 = lstm_cell(params["lstm1"], x, (h1, c1))
    h2, c2 = lstm_cell(params["lstm2"], h1, (h2, c2))
    out = linear(params["fc2"], h2)
    return out, ((h1, c1), (h2, c2))


def _resolve_meta(meta, batch: int, cfg: CRnnGanConfig):
    """[B, meta_dim] conditioning rows, or None when unconditioned."""
    if cfg.meta_dim == 0:
        return None
    if meta is None:
        return jnp.zeros((batch, cfg.meta_dim))
    return meta


def condition_events(events: jax.Array, meta, cfg: CRnnGanConfig) -> jax.Array:
    """Append per-song meta one-hots to every timestep's event features —
    the conditional-D input (no-op when cfg.meta_dim == 0)."""
    meta = _resolve_meta(meta, events.shape[0], cfg)
    if meta is None:
        return events
    B, T = events.shape[0], events.shape[1]
    tiled = jnp.broadcast_to(meta[:, None, :], (B, T, meta.shape[-1]))
    return jnp.concatenate([events, tiled.astype(events.dtype)], axis=-1)


def _key_jitter(key):
    # shard_map device-variance workaround (parallel/vma.py): scan carries
    # must share the per-shard key's data-axis-varying status.
    return varying_zero(key, jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "batch", "length"))
def generate(params: dict, key: jax.Array, cfg: CRnnGanConfig, batch: int,
             length: int | None = None, meta: jax.Array | None = None) -> jax.Array:
    """Free-running generation: [batch, length, 4] events, optionally
    conditioned on per-song [batch, meta_dim] genre/composer one-hots."""
    length = length or cfg.song_length
    H = cfg.hidden_dim
    jitter = _key_jitter(key)
    h0 = tuple(x + jitter for x in lstm_zero_state(batch, H))
    state = (h0, h0)
    meta = _resolve_meta(meta, batch, cfg)
    noise = jax.random.uniform(key, (length, batch, cfg.noise_dim))

    def step(carry, noise_t):
        prev, state = carry
        out, state = _g_step(params, noise_t, prev, meta, state)
        return (out, state), out

    prev0 = jnp.zeros((batch, cfg.num_song_features)) + jitter
    _, outs = jax.lax.scan(step, (prev0, state), noise)
    return jnp.swapaxes(outs, 0, 1)


def generator_teacher_forced(params: dict, key: jax.Array, real: jax.Array,
                             cfg: CRnnGanConfig,
                             meta: jax.Array | None = None) -> jax.Array:
    """Teacher-forced outputs: step t consumes real event t-1 (zeros at
    t=0); used by MSE pretraining (the intent of model.py:93-98)."""
    B, T, F = real.shape
    H = cfg.hidden_dim
    jitter = _key_jitter(key)
    h0 = tuple(x + jitter for x in lstm_zero_state(B, H))
    state = (h0, h0)
    meta = _resolve_meta(meta, B, cfg)
    noise = jax.random.uniform(key, (T, B, cfg.noise_dim))
    prev = jnp.concatenate([jnp.zeros((B, 1, F)), real[:, :-1]], axis=1)
    prev = jnp.swapaxes(prev, 0, 1)  # [T, B, F]

    def step(state, inp):
        noise_t, prev_t = inp
        out, state = _g_step(params, noise_t, prev_t, meta, state)
        return state, out

    _, outs = jax.lax.scan(step, state, (noise, prev))
    return jnp.swapaxes(outs, 0, 1)


def _bilstm(fwd_params, bwd_params, xs):
    """xs [B, T, F] -> [B, T, 2H] (forward ‖ backward passes)."""
    B = xs.shape[0]
    H = fwd_params["wh"].shape[0]

    def run(params, seq):
        # zero-valued but input-dependent carry jitter: under shard_map the
        # scan carry must share the sharded input's data-axis-varying status
        # (see models/seqgan.py:generate for the key-based variant)
        jitter = seq.ravel()[0] * 0.0
        h0 = tuple(x + jitter for x in lstm_zero_state(B, H))

        def step(carry, x_t):
            h, c = lstm_cell(params, x_t, carry)
            return (h, c), h
        _, hs = jax.lax.scan(step, h0, seq)
        return hs

    fwd = run(fwd_params, jnp.swapaxes(xs, 0, 1))
    bwd = run(bwd_params, jnp.swapaxes(xs, 0, 1)[::-1])[::-1]
    return jnp.swapaxes(jnp.concatenate([fwd, bwd], axis=-1), 0, 1)


def discriminator_forward(params: dict, events: jax.Array, cfg: CRnnGanConfig,
                          meta: jax.Array | None = None):
    """[B, T, 4] events -> (decisions [B, T] in (0,1), features [B, T, 2H])
    — per-timestep real/fake decisions + the feature-matching hook
    (model.py:104-137's intent).  ``meta``: [B, meta_dim] conditioning rows
    when cfg.meta_dim > 0 (conditional D)."""
    events = condition_events(events, meta, cfg)
    h = _bilstm(params["fwd1"], params["bwd1"], events)
    h = _bilstm(params["fwd2"], params["bwd2"], h)
    logits = linear(params["out"], h)[..., 0]
    return jax.nn.sigmoid(logits), h


def d_loss(d_params: dict, real: jax.Array, fake: jax.Array, cfg: CRnnGanConfig,
           eps: float = 1e-7, d_forward=None,
           meta: jax.Array | None = None) -> jax.Array:
    """Per-timestep BCE: real -> 1, fake -> 0.  ``d_forward`` overrides the
    discriminator forward (the model-parallel trainer passes
    parallel/gan_tp.crnngan_forward_tp)."""
    fwd = d_forward or discriminator_forward
    p_real, _ = fwd(d_params, real, cfg, meta=meta)
    p_fake, _ = fwd(d_params, fake, cfg, meta=meta)
    return -(jnp.mean(jnp.log(p_real + eps)) + jnp.mean(jnp.log(1.0 - p_fake + eps)))


def g_adv_loss(g_params: dict, d_params: dict, key: jax.Array, batch: int,
               cfg: CRnnGanConfig, meta: jax.Array | None = None,
               d_forward=None) -> jax.Array:
    """Adversarial G loss: -mean log D(fake)."""
    fwd = d_forward or discriminator_forward
    fake = generate(g_params, key, cfg, batch, meta=meta)
    p_fake, _ = fwd(d_params, fake, cfg, meta=meta)
    return -jnp.mean(jnp.log(p_fake + 1e-7))


def g_feature_matching_loss(g_params: dict, d_params: dict, key: jax.Array,
                            real: jax.Array, cfg: CRnnGanConfig,
                            meta: jax.Array | None = None,
                            axis_name: str | None = None,
                            d_forward=None) -> jax.Array:
    """Paper's feature matching: MSE between mean D features on real vs
    fake batches.  ``axis_name``: data mesh axis when called inside
    shard_map — the feature means are pmean'd over the GLOBAL batch before
    the MSE (the loss is nonlinear in the mean, so per-shard means would
    change semantics)."""
    fwd = d_forward or discriminator_forward
    fake = generate(g_params, key, cfg, real.shape[0], meta=meta)
    _, f_real = fwd(d_params, real, cfg, meta=meta)
    _, f_fake = fwd(d_params, fake, cfg, meta=meta)
    fr, ff = f_real.mean(axis=(0, 1)), f_fake.mean(axis=(0, 1))
    if axis_name is not None:
        fr, ff = jax.lax.pmean((fr, ff), axis_name)
    loss = jnp.mean((fr - ff) ** 2)
    if axis_name is not None:
        # re-mark as axis-varying so this branch type-matches the (varying)
        # adversarial loss under lax.cond inside shard_map
        loss = jax.lax.pcast(loss, axis_name, to="varying")
    return loss


def g_pretrain_loss(g_params: dict, key: jax.Array, real: jax.Array,
                    cfg: CRnnGanConfig, meta: jax.Array | None = None) -> jax.Array:
    """MSE regression of teacher-forced outputs onto the real events."""
    pred = generator_teacher_forced(g_params, key, real, cfg, meta=meta)
    return jnp.mean((pred - real) ** 2)
