"""Multi-chip (CPU-simulated) WaveNet training: the sharded dp x sp x tp loss
must match the single-device loss and gradients, and the train step must run
with all three axes active."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from music_tpu.models import wavenet as wn
from music_tpu.parallel.mesh import MeshSpec, make_mesh
from music_tpu.train import wavenet_train as wt

TINY = wn.WaveNetConfig(
    filter_width=2,
    dilations=(1, 2, 4, 8, 1, 2, 4, 8),
    dilation_channels=8,
    residual_channels=8,
    skip_channels=16,
    quantization_channels=32,
    use_bias=False,
)
WL = 16  # window_length; tokens are [B, RF + WL] = [B, 48]


def _data(batch=4):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 32, (batch, TINY.receptive_field + WL)), jnp.int32)


def test_sharded_loss_matches_unsharded():
    mesh = make_mesh(MeshSpec(data=2, seq=2, model=2))
    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    tokens = _data()

    ref_loss, ref_grads = jax.value_and_grad(wn.loss_fn)(params, tokens, TINY)

    loss_fn, specs = wt.make_loss_fn(TINY, mesh, WL)
    sharded_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, {k: specs[k] for k in params},
    )
    tokens_sh = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    loss, grads = jax.value_and_grad(loss_fn)(sharded_params, tokens_sh)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for k in ref_grads:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_grads[k]), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch for {k}",
        )


def test_sharded_train_step_decreases_loss():
    mesh = make_mesh(MeshSpec(data=2, seq=2, model=2))
    tx = optax.adam(1e-2)
    state = wt.init_state(jax.random.PRNGKey(1), TINY, tx, mesh)
    step_fn, _ = wt.make_train_step(TINY, tx, mesh, WL)
    t = np.arange(TINY.receptive_field + WL)
    tokens = jnp.asarray((t % 32)[None].repeat(4, 0), jnp.int32)
    tokens = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    losses = []
    for _ in range(20):
        state, loss = step_fn(state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 20


def test_halo_exchange_identity():
    """left_halo_exchange over seq must reproduce the unsharded sequence."""
    from jax import shard_map
    from music_tpu.parallel.halo import left_halo_exchange

    mesh = make_mesh(MeshSpec(data=1, seq=4, model=1), devices=jax.devices()[:4])
    x = jnp.arange(4 * 16 * 2, dtype=jnp.float32).reshape(1, 64, 2)

    def f(xl):
        return left_halo_exchange(xl, halo=3, axis_name="seq")

    y = shard_map(
        f, mesh=mesh, in_specs=P(None, "seq", None), out_specs=P(None, "seq", None)
    )(x)
    y = np.asarray(y)
    # each shard's chunk: [3 halo | 16 local]; shard 0 halo is zeros
    chunk = y.reshape(1, 4, 19, 2)
    np.testing.assert_array_equal(chunk[0, 0, :3], np.zeros((3, 2)))
    for s in range(1, 4):
        np.testing.assert_array_equal(
            chunk[0, s, :3], np.asarray(x[0, s * 16 - 3 : s * 16])
        )
    for s in range(4):
        np.testing.assert_array_equal(
            chunk[0, s, 3:], np.asarray(x[0, s * 16 : (s + 1) * 16])
        )


def test_bf16_compute_loss_close_to_f32():
    mesh = make_mesh(MeshSpec(data=2, seq=2, model=2))
    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    tokens = _data()
    f32_fn, specs = wt.make_loss_fn(TINY, mesh, WL)
    bf16_fn, _ = wt.make_loss_fn(TINY, mesh, WL, compute_dtype=jnp.bfloat16)
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, {k: specs[k] for k in params},
    )
    toks = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    l32, lb16 = float(f32_fn(sharded, toks)), float(bf16_fn(sharded, toks))
    assert abs(l32 - lb16) / abs(l32) < 0.02, (l32, lb16)
    # grads flow and stay f32
    grads = jax.grad(bf16_fn)(sharded, toks)
    assert all(g.dtype == jnp.float32 for g in jax.tree_util.tree_leaves(grads))


def test_stack_skips_loss_and_grads_match():
    """stack_skips computes the skip projection as ONE [B·T, L·Cd] x
    [L·Cd, Cs] GEMM — a block-matmul identity with the per-layer sum, so
    loss and grads must match the baseline (incl. under dp x sp x tp,
    where the skip weight is column-split)."""
    params = wn.init_params(jax.random.PRNGKey(5), TINY)
    tokens = _data()
    import jax as _jax
    for spec in (MeshSpec(data=1, seq=1, model=1), MeshSpec(data=2, seq=2, model=2)):
        mesh = make_mesh(spec, devices=_jax.devices()[: spec.data * spec.seq * spec.model])
        base_fn, specs = wt.make_loss_fn(TINY, mesh, WL)
        stk_fn, _ = wt.make_loss_fn(TINY, mesh, WL, stack_skips=True)
        sharded = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, {k: specs[k] for k in params},
        )
        tok = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
        l0, g0 = jax.value_and_grad(base_fn)(sharded, tok)
        l1, g1 = jax.value_and_grad(stk_fn)(sharded, tok)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        for k in g0:
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-4, atol=1e-6,
                err_msg=f"grad mismatch for {k} at {spec}",
            )


def test_skip_block_loss_and_grads_match():
    """skip_block=K (layer-blocked stacked skip GEMMs, VERDICT r4 #7) is
    the same block-matmul identity as stack_skips applied per K-layer
    block — loss and grads must match the per-layer baseline, including a
    K that does not divide L (ragged last block) and under dp x sp x tp."""
    params = wn.init_params(jax.random.PRNGKey(7), TINY)
    tokens = _data()
    import jax as _jax
    for spec in (MeshSpec(data=1, seq=1, model=1), MeshSpec(data=2, seq=2, model=2)):
        mesh = make_mesh(spec, devices=_jax.devices()[: spec.data * spec.seq * spec.model])
        base_fn, specs = wt.make_loss_fn(TINY, mesh, WL)
        sharded = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, {k: specs[k] for k in params},
        )
        tok = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
        l0, g0 = jax.value_and_grad(base_fn)(sharded, tok)
        for K in (2, 3):  # 3 does not divide TINY's 8 layers
            blk_fn, _ = wt.make_loss_fn(TINY, mesh, WL, skip_block=K)
            l1, g1 = jax.value_and_grad(blk_fn)(sharded, tok)
            np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
            for k in g0:
                np.testing.assert_allclose(
                    np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-4, atol=1e-6,
                    err_msg=f"grad mismatch for {k} at {spec}, K={K}",
                )
