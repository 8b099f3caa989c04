"""shard_map varying-manual-axes (vma) zero helper.

Inside ``shard_map``, ``lax.scan`` requires carries and scanned inputs to
agree on which mesh axes they vary over.  A per-shard PRNG key (folded with
``axis_index``) is data-axis-varying; fresh zero carries built from
``jnp.zeros`` are unvarying, so the scan rejects the pair.  The fix used
throughout the models is a *numerically-zero but data-flow-dependent*
"jitter" derived from the varying reference (``key[0] % 1`` for integer
refs, ``x * 0`` for float refs) added to each carry leaf.

This module is the single home for that trick (previously copied in
``models/seqgan.py``, ``models/leakgan.py``, ``models/crnngan.py`` and
``ops/rnn.py``).  It relies on JAX NOT constant-folding ``x % 1`` / ``x * 0``
across the varying-axis analysis; ``tests/test_vma.py`` is the seconds-fast
regression that breaks loudly on a JAX upgrade instead of 20 minutes into
the full dp-trainer suite.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def varying_zero(ref: jax.Array, dtype=jnp.float32) -> jax.Array:
    """A scalar zero of ``dtype`` that inherits ``ref``'s varying-axes status.

    ``ref`` is any array whose shard_map device-variance the result should
    carry (typically the per-shard PRNG key).  The result is numerically 0
    but data-flow-dependent on ``ref``, so adding it to a fresh carry makes
    the carry legal next to ``ref``-derived scanned inputs.
    """
    x = jnp.ravel(ref)[0]
    if jnp.issubdtype(x.dtype, jnp.integer):
        z = x % jnp.ones((), x.dtype)
    else:
        z = x * jnp.zeros((), x.dtype)
    return z.astype(dtype)
