"""Sampling primitives used by every generation path.

The reference samples three ways:
- ``torch.topk(probs, 1)`` greedy argmax (wavenet/fast_generate.py:138-139,
  wavenet/model.py:164);
- ``torch.multinomial(-log_softmax(out))`` — a bug: the weights passed are
  *negative log-probs*, not probs (SeqGan_Pytorch/generator.py:80).  We
  implement the intended categorical sampling (docs/DIVERGENCES.md #5);
- ``torch.distributions.Categorical(probs).sample()`` with a temperature
  multiplier on logits (leak_gan/model.py:230-233).

All primitives take logits (never probs — numerically safer) and are usable
inside ``lax.scan`` bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_sample(logits: jax.Array) -> jax.Array:
    """Greedy: index of max logit along the last axis (topk-1 parity)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def categorical(key: jax.Array, logits: jax.Array, temperature: float = 1.0) -> jax.Array:
    """Sample from softmax(logits * 1/temperature)... note LeakGAN multiplies
    logits by its ``temperature`` parameter (leak_gan/model.py:230), i.e. its
    T>1 *sharpens*; we follow standard semantics (divide) and callers that
    need LeakGAN parity pre-multiply."""
    if temperature != 1.0:
        logits = logits / temperature
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def gumbel_argmax(key: jax.Array, logits: jax.Array) -> jax.Array:
    """Categorical sampling via Gumbel-max — the scan-friendly form used
    inside fused generation loops (one uniform draw + argmax, no CDF scan)."""
    u = jax.random.uniform(key, logits.shape, minval=1e-20, maxval=1.0)
    return jnp.argmax(logits - jnp.log(-jnp.log(u)), axis=-1).astype(jnp.int32)
