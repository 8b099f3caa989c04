"""WaveNet: dilated-causal-conv raw-audio model, TPU-native.

Reference: wavenet/model.py (stack of 40 gated residual blocks over µ-law
one-hot audio; gating sigmoid(gate)*tanh(filter) at model.py:120, residual
add on the time-sliced input :122-124, skip contributions summed over the
last ``output_width`` steps :127-134, post-process relu->1x1->relu->1x1
:136-138, receptive field ``(fw-1)(sum(d)+1)+1`` :43-44) and
wavenet/fast_generate.py (cached O(1)-per-sample autoregressive decode via
per-layer shift-register state queues :40-47,99-104).

TPU-first redesign decisions (none of the reference's structure is copied —
the math is the WaveNet paper's):

- **Params are stacked across blocks** (`[n_blocks, ...]` leading axis): all
  40 residual blocks share shapes, so weights live in a handful of big
  arrays instead of 160 small ones — friendlier to sharding annotations,
  checkpointing, and fused generation kernels.
- **Filter+gate fused into one GEMM** per block (2*dilation_channels output
  columns), the trick the reference's autoencoder already plays
  (wavenet_autoencoder/model1.py:186-192).
- **Training consumes integer codes, not one-hot**: the causal layer over a
  one-hot input is an embedding gather (`onehot(x) @ W == W[x]`), so the
  reference's ``[B, 256, 44093]`` float one-hot windows
  (faster_audio_data.py:45-48) never exist on device.
- **Forward returns logits**, and training uses logits cross-entropy.  The
  reference applies CrossEntropyLoss to *softmaxed* outputs — a
  double-softmax (model.py:144 + train.py:179); we implement the intent
  (docs/DIVERGENCES.md #2).
- **Generation is one compiled ``lax.scan``** over samples: the per-layer
  shift-register caches are ring buffers in the scan carry, sampling and
  re-embedding included, so 160k-sample decodes run as a single XLA program
  instead of 160k Python iterations (fast_generate.py:162-172).  A fully
  fused Pallas single-kernel decoder lives in
  :mod:`music_tpu.kernels.wavenet_decode`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from music_tpu.ops.conv import conv1x1, dilated_causal_conv, token_causal_conv
from music_tpu.ops.sampling import argmax_sample, gumbel_argmax


@dataclasses.dataclass(frozen=True)
class WaveNetConfig:
    """Mirrors the reference's wavenet_params.json schema
    (wavenet/params/wavenet_params.json; constructor wavenet/model.py:8-41)."""

    filter_width: int = 2
    dilations: tuple[int, ...] = tuple([2**i for i in range(10)] * 4)
    dilation_channels: int = 32
    residual_channels: int = 32
    skip_channels: int = 512
    quantization_channels: int = 256
    use_bias: bool = False

    @property
    def n_blocks(self) -> int:
        return len(self.dilations)

    @property
    def receptive_field(self) -> int:
        # (fw-1)*(sum(dilations)+1)+1  — wavenet/model.py:43-44
        return (self.filter_width - 1) * (sum(self.dilations) + 1) + 1

    @classmethod
    def from_json(cls, cfg: dict) -> "WaveNetConfig":
        return cls(
            filter_width=cfg["filter_width"],
            dilations=tuple(cfg["dilations"]),
            dilation_channels=cfg["dilation_channels"],
            residual_channels=cfg["residual_channels"],
            skip_channels=cfg["skip_channels"],
            quantization_channels=cfg["quantization_channels"],
            use_bias=bool(cfg.get("use_bias", False)),
        )


def _uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch Conv1d default init: U(-1/sqrt(fan_in*kw), 1/sqrt(fan_in*kw))."""
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_params(key: jax.Array, cfg: WaveNetConfig) -> dict:
    """Parameter pytree.  Shapes (fw=filter_width, L=n_blocks):

    - ``causal``:   [fw, Q, Cr]
    - ``fg``:       [L, fw, Cr, 2*Cd]   (filter ‖ gate fused)
    - ``dense``:    [L, Cd, Cr]
    - ``skip``:     [L, Cd, Cs]
    - ``post1``:    [Cs, Cs]
    - ``post2``:    [Cs, Q]
    - optional ``*_b`` biases when cfg.use_bias.
    """
    fw, L = cfg.filter_width, cfg.n_blocks
    Q, Cr, Cd, Cs = (
        cfg.quantization_channels,
        cfg.residual_channels,
        cfg.dilation_channels,
        cfg.skip_channels,
    )
    ks = jax.random.split(key, 8)
    p = {
        "causal": _uniform(ks[0], (fw, Q, Cr), Q * fw),
        "fg": _uniform(ks[1], (L, fw, Cr, 2 * Cd), Cr * fw),
        "dense": _uniform(ks[2], (L, Cd, Cr), Cd),
        "skip": _uniform(ks[3], (L, Cd, Cs), Cd),
        "post1": _uniform(ks[4], (Cs, Cs), Cs),
        "post2": _uniform(ks[5], (Cs, Q), Cs),
    }
    if cfg.use_bias:
        p["causal_b"] = jnp.zeros((Cr,))
        p["fg_b"] = jnp.zeros((L, 2 * Cd))
        p["dense_b"] = jnp.zeros((L, Cr))
        p["skip_b"] = jnp.zeros((L, Cs))
        p["post1_b"] = jnp.zeros((Cs,))
        p["post2_b"] = jnp.zeros((Q,))
    return p


def _gate(fg: jax.Array) -> jax.Array:
    """sigmoid(gate) * tanh(filter) — wavenet/model.py:120.  ``fg`` carries
    filter in the first half of the last axis, gate in the second."""
    f, g = jnp.split(fg, 2, axis=-1)
    return jnp.tanh(f) * jax.nn.sigmoid(g)


def forward(params: dict, tokens: jax.Array, cfg: WaveNetConfig) -> jax.Array:
    """Training forward over integer µ-law codes.

    Args:
      params: from :func:`init_params`.
      tokens: ``[B, T]`` int codes, ``T >= receptive_field`` (the reference
        raises on shorter input, wavenet/model.py:98-101).

    Returns:
      logits ``[B, T - receptive_field + 1, Q]`` — prediction for the sample
      *after* each full receptive field (same output width as
      wavenet/model.py:99).
    """
    T = tokens.shape[1]
    out_width = T - cfg.receptive_field + 1
    if out_width <= 0:
        raise ValueError(f"sequence length {T} < receptive field {cfg.receptive_field}")

    use_bias = cfg.use_bias
    x = token_causal_conv(
        tokens, params["causal"], params.get("causal_b") if use_bias else None
    )
    skip_total = None
    for i, d in enumerate(cfg.dilations):
        fg = dilated_causal_conv(
            x, params["fg"][i], params["fg_b"][i] if use_bias else None, dilation=d
        )
        z = _gate(fg)
        dense = conv1x1(z, params["dense"][i], params["dense_b"][i] if use_bias else None)
        x = dense + x[:, -dense.shape[1]:, :]
        skip = conv1x1(
            z[:, -out_width:, :], params["skip"][i],
            params["skip_b"][i] if use_bias else None,
        )
        skip_total = skip if skip_total is None else skip_total + skip

    h = jax.nn.relu(skip_total)
    h = conv1x1(h, params["post1"], params.get("post1_b") if use_bias else None)
    h = jax.nn.relu(h)
    return conv1x1(h, params["post2"], params.get("post2_b") if use_bias else None)


def forward_onehot(params: dict, wave: jax.Array, cfg: WaveNetConfig) -> jax.Array:
    """Parity-surface forward over one-hot input ``[B, T, Q]`` (channels-last)
    — the reference's input convention (wavenet/model.py:86-97), provided for
    equivalence tests against :func:`forward`."""
    x0 = dilated_causal_conv(
        wave, params["causal"], params.get("causal_b") if cfg.use_bias else None, dilation=1
    )
    return _forward_from_causal(params, x0, cfg)


def _forward_from_causal(params: dict, x: jax.Array, cfg: WaveNetConfig) -> jax.Array:
    T = x.shape[1] + cfg.filter_width - 1
    out_width = T - cfg.receptive_field + 1
    use_bias = cfg.use_bias
    skip_total = None
    for i, d in enumerate(cfg.dilations):
        fg = dilated_causal_conv(
            x, params["fg"][i], params["fg_b"][i] if use_bias else None, dilation=d
        )
        z = _gate(fg)
        dense = conv1x1(z, params["dense"][i], params["dense_b"][i] if use_bias else None)
        x = dense + x[:, -dense.shape[1]:, :]
        skip = conv1x1(
            z[:, -out_width:, :], params["skip"][i],
            params["skip_b"][i] if use_bias else None,
        )
        skip_total = skip if skip_total is None else skip_total + skip
    h = jax.nn.relu(skip_total)
    h = conv1x1(h, params["post1"], params.get("post1_b") if use_bias else None)
    h = jax.nn.relu(h)
    return conv1x1(h, params["post2"], params.get("post2_b") if use_bias else None)


def loss_fn(params: dict, tokens: jax.Array, cfg: WaveNetConfig) -> jax.Array:
    """Next-sample cross entropy.  Targets are the codes following each
    receptive field — the window/target split of faster_audio_data.py:29-40
    collapsed into one array: ``tokens[:, receptive_field:]`` are the targets
    for logits positions ``[:-1]``."""
    logits = forward(params, tokens[:, :-1], cfg)
    targets = tokens[:, cfg.receptive_field:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


# ---------------------------------------------------------------------------
# Fast autoregressive generation: one lax.scan, ring-buffer caches as carry.
# ---------------------------------------------------------------------------


def init_cache(cfg: WaveNetConfig, batch: int, dtype=jnp.float32) -> dict:
    """Decode cache: per-block ring buffers of residual inputs.

    ``ring[i]`` holds the last ``dilations[i]`` residual-path inputs of block
    ``i`` (the reference's OrderedDict state queues, fast_generate.py:40-47),
    stored in one ``[L, D_max, B, Cr]`` array: slot ``t mod d_i`` is exactly
    the activation from ``t - d_i`` at read time — read, use, overwrite with
    the current activation, no shifting (vs the reference's per-step
    concat-and-shift, fast_generate.py:99-104).

    fw > 2 generalizes with ``fw - 1`` taps read at ``t - k*d_i``; the
    shipped configs all use fw=2 (wavenet_params.json).
    """
    if cfg.filter_width != 2:
        raise NotImplementedError("fast decode cache assumes filter_width=2")
    D_max = max(cfg.dilations)
    return {
        "ring": jnp.zeros((cfg.n_blocks, D_max, batch, cfg.residual_channels), dtype),
        "prev_token": jnp.zeros((batch,), jnp.int32),
        "t": jnp.zeros((), jnp.int32),
    }


def decode_step(params: dict, cache: dict, token: jax.Array, cfg: WaveNetConfig):
    """One autoregressive step: consume ``token`` ([B] int), emit logits for
    the next sample, update the cache.  Cost: O(n_blocks) tiny GEMMs — the
    skip projections of all blocks are batched into a single GEMM.
    """
    use_bias = cfg.use_bias
    t = cache["t"]
    # causal layer: W_prev[x_{t-1}] + W_cur[x_t]
    x = params["causal"][1][token] + params["causal"][0][cache["prev_token"]]
    if use_bias:
        x = x + params["causal_b"]

    ring = cache["ring"]
    zs = []
    for i, d in enumerate(cfg.dilations):
        slot = jax.lax.rem(t, jnp.int32(d))
        prev = jax.lax.dynamic_index_in_dim(ring[i], slot, axis=0, keepdims=False)
        fg = prev @ params["fg"][i, 0] + x @ params["fg"][i, 1]
        if use_bias:
            fg = fg + params["fg_b"][i]
        z = _gate(fg)
        ring = ring.at[i, slot].set(x)
        dense = z @ params["dense"][i]
        if use_bias:
            dense = dense + params["dense_b"][i]
        x = x + dense
        zs.append(z)

    # batched skip projection: [B, L*Cd] @ [L*Cd, Cs] — one GEMM for all blocks
    z_all = jnp.concatenate(zs, axis=-1)
    skip_w = params["skip"].reshape(-1, cfg.skip_channels)
    skip_total = z_all @ skip_w
    if use_bias:
        skip_total = skip_total + params["skip_b"].sum(axis=0)

    h = jax.nn.relu(skip_total)
    h = h @ params["post1"]
    if use_bias:
        h = h + params["post1_b"]
    h = jax.nn.relu(h)
    logits = h @ params["post2"]
    if use_bias:
        logits = logits + params["post2_b"]

    new_cache = {"ring": ring, "prev_token": token, "t": t + 1}
    return new_cache, logits


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_steps", "prime_len", "sample_mode", "temperature")
)
def generate_tokens(
    params: dict,
    prime: jax.Array,
    key: jax.Array,
    *,
    cfg: WaveNetConfig,
    n_steps: int,
    prime_len: int,
    sample_mode: str = "argmax",
    temperature: float = 1.0,
) -> jax.Array:
    """Generate ``n_steps`` µ-law codes after teacher-forcing ``prime``.

    The whole decode — priming, sampling, cache updates, re-embedding — is a
    single ``lax.scan`` compiled once; nothing crosses the host per sample
    (vs fast_generate.py:162-172's 160k Python iterations).

    Args:
      prime: ``[B, prime_len]`` int codes (the reference seeds with a
        receptive field of µ-law 128 silence, fast_generate.py:158-161).
      sample_mode: ``"argmax"`` (reference parity, fast_generate.py:138-139)
        or ``"categorical"``.

    Returns:
      ``[B, n_steps]`` sampled codes.
    """
    B = prime.shape[0]
    cache = init_cache(cfg, B)
    total = prime_len - 1 + n_steps

    def step(carry, i):
        cache, last_sampled = carry
        token = jnp.where(
            i < prime_len,
            prime[:, jnp.minimum(i, prime_len - 1)],
            last_sampled,
        )
        cache, logits = decode_step(params, cache, token, cfg)
        if sample_mode == "argmax":
            sampled = argmax_sample(logits)
        else:
            k = jax.random.fold_in(key, i)
            sampled = gumbel_argmax(k, logits / temperature)
        return (cache, sampled), sampled

    # zero-valued but VARYING-typed initial carry: under shard_map with
    # sharded prime rows / a per-device key (serving scale-out,
    # generate_batch(mesh=...)) the scan outputs are device-varying, so
    # every carry leaf's init must carry the varying-axis type or the
    # scan rejects the carry (the jax 0.9 vma rule; same trick as
    # models/seqgan.py).  x % 1 is constant 0 — it only transfers the
    # type, from whichever of (key, prime) is varying.
    kd = key if key.dtype == jnp.uint32 else jax.random.key_data(key)
    jitter = ((kd.ravel()[0] % 1) + (prime.ravel()[0] % 1)).astype(jnp.int32)
    cache = jax.tree_util.tree_map(lambda x: x + jitter.astype(x.dtype), cache)
    (_, _), samples = jax.lax.scan(
        step, (cache, jnp.zeros((B,), jnp.int32) + jitter), jnp.arange(total)
    )
    # samples[i] is the prediction after consuming input i; the generated
    # continuation is the last n_steps of them
    return samples[-n_steps:].T
