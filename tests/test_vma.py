"""Seconds-fast regression for the shard_map vma zero trick (parallel/vma.py).

The models rely on JAX not constant-folding ``key[0] % 1`` / ``x * 0``
across shard_map's varying-manual-axes analysis.  If a JAX upgrade breaks
that, this file fails in seconds instead of the dp trainer tests failing
20 minutes into the full suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from music_tpu.parallel.vma import varying_zero

pytestmark = pytest.mark.fast  # seconds-fast regression tier (pytest -m fast)


def test_varying_zero_values_and_dtypes():
    key = jax.random.PRNGKey(0)
    assert float(varying_zero(key)) == 0.0
    assert varying_zero(key, jnp.int32).dtype == jnp.int32
    assert int(varying_zero(key, jnp.int32)) == 0
    x = jnp.full((3, 4), 7.5, jnp.float32)
    z = varying_zero(x, jnp.bfloat16)
    assert z.dtype == jnp.bfloat16 and float(z) == 0.0
    # inf/nan-free refs only in practice, but check a negative float ref too
    assert float(varying_zero(jnp.array([-2.5]))) == 0.0


def test_varying_zero_carry_traces_in_shard_map_scan():
    """The canonical model pattern: per-shard folded key drives a scan whose
    zero carries are made key-varying via varying_zero."""
    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()), ("data",))

    def per_shard(key):
        key = key[0]  # [1, 2] block -> single key
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        zf = varying_zero(key, jnp.float32)
        zi = varying_zero(key, jnp.int32)
        carry0 = (jnp.zeros((4,), jnp.float32) + zf, jnp.zeros((), jnp.int32) + zi)

        def step(carry, k):
            acc, cnt = carry
            return (acc + jax.random.uniform(k, (4,)), cnt + 1), cnt

        (acc, cnt), idx = jax.lax.scan(step, carry0, jax.random.split(key, 3))
        return acc[None], cnt[None], idx[None]

    keys = jax.random.split(jax.random.PRNGKey(1), n)
    fn = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=P("data"),
            out_specs=(P("data"), P("data"), P("data")),
        )
    )
    acc, cnt, idx = fn(keys)  # trace failure here = the regression
    assert acc.shape == (n, 4)
    np.testing.assert_array_equal(np.asarray(cnt), np.full((n,), 3, np.int32))
    # shards fold distinct axis indices -> distinct streams
    if n > 1:
        assert not np.allclose(np.asarray(acc[0]), np.asarray(acc[1]))


def test_varying_zero_float_ref_in_shard_map_scan():
    """The ops/rnn.lstm_scan pattern: zero state derived from a sharded
    float input feeding a scan."""
    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()), ("data",))

    def per_shard(xs):
        z = varying_zero(xs, xs.dtype)
        carry0 = z + jnp.zeros((xs.shape[0], 2), xs.dtype)

        def step(c, x_t):
            return c + x_t[:, :2], c

        c, hs = jax.lax.scan(step, carry0, jnp.swapaxes(xs, 0, 1))
        return c

    xs = jnp.arange(n * 2 * 3 * 4, dtype=jnp.float32).reshape(n * 2, 3, 4)
    fn = jax.jit(shard_map(per_shard, mesh=mesh, in_specs=P("data"), out_specs=P("data")))
    out = fn(xs)
    expected = np.asarray(xs)[:, :, :2].sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
