"""Model-axis (tensor-parallel) GAN discriminator: forward and grads must
match the single-device path exactly (the wavenet TP test's contract,
tests/test_wavenet_sharded.py, applied to the 1720-filter D shape of
SeqGan_Pytorch/discriminator.py:38-91 / leak_gan/model.py:97-125)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from music_tpu.models import leakgan as lg
from music_tpu.models import seqgan as sg
from music_tpu.parallel import gan_tp
from music_tpu.parallel.mesh import MeshSpec, make_mesh

SG_CFG = sg.DiscriminatorConfig(
    vocab_size=40, emb_dim=8, filter_sizes=(1, 2, 3), num_filters=(8, 8, 16),
    seq_len=10, dropout=0.25,
)
LG_CFG = lg.LeakGanConfig(
    vocab_size=40, seq_len=10, step_size=5, goal_size=4,
    worker_emb_dim=8, worker_hidden=8, manager_hidden=8,
    dis_emb_dim=8, filter_sizes=(1, 2, 3), num_filters=(8, 8, 16),
    dropout=0.2,
)


def _tp_mesh(m):
    return make_mesh(MeshSpec(data=1, seq=1, model=m), devices=jax.devices()[:m])


def _shard(mesh, params, specs):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray) or isinstance(x, np.ndarray),
    )


def _forward_match(m):
    mesh = _tp_mesh(m)
    params = sg.init_discriminator(jax.random.PRNGKey(0), SG_CFG)
    specs = gan_tp.discriminator_specs(SG_CFG)
    sharded = _shard(mesh, params, specs)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (6, 10), 0, 40)

    ref = sg.discriminator_forward(params, tokens, SG_CFG)
    tp_fwd = shard_map(
        lambda p, t: gan_tp.discriminator_forward_tp(p, t, SG_CFG),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
    )
    out = tp_fwd(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out["score"]), np.asarray(ref["score"]), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["feature"]), np.asarray(ref["feature"]), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["pred"]), np.asarray(ref["pred"]), rtol=2e-5, atol=1e-6)


def test_seqgan_tp_forward_matches_m2():
    _forward_match(2)


def test_seqgan_tp_forward_matches_m4():
    _forward_match(4)


def test_seqgan_tp_grads_match():
    mesh = _tp_mesh(2)
    params = sg.init_discriminator(jax.random.PRNGKey(0), SG_CFG)
    specs = gan_tp.discriminator_specs(SG_CFG)
    sharded = _shard(mesh, params, specs)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (6, 10), 0, 40)
    labels = jnp.asarray([0, 1, 1, 0, 1, 0], jnp.int32)
    dkey = jax.random.PRNGKey(7)

    ref_loss, ref_grads = jax.value_and_grad(sg.discriminator_loss)(
        params, tokens, labels, SG_CFG, dkey
    )
    tp_loss_fn = shard_map(
        lambda p, t, l, k: gan_tp.seqgan_dis_loss_tp(p, t, l, SG_CFG, k),
        mesh=mesh, in_specs=(specs, P(), P(), P()), out_specs=P(),
    )
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(tp_loss_fn))(
        sharded, tokens, labels, dkey
    )
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        tp_grads, ref_grads,
    )


def test_leakgan_tp_forward_and_grads_match():
    mesh = _tp_mesh(2)
    params = lg.init_discriminator(jax.random.PRNGKey(0), LG_CFG)
    specs = gan_tp.discriminator_specs(LG_CFG)
    sharded = _shard(mesh, params, specs)
    # include the pad token (vocab_size) like the engines do
    tokens = jax.random.randint(jax.random.PRNGKey(1), (6, 10), 0, 41)
    labels = jnp.asarray([0, 1, 1, 0, 1, 0], jnp.int32)
    dkey = jax.random.PRNGKey(7)

    ref = lg.discriminator_forward(params, tokens, LG_CFG, dropout_key=dkey)
    tp_fwd = shard_map(
        lambda p, t, k: gan_tp.discriminator_forward_tp(
            p, t, LG_CFG, dropout_key=k,
            post_highway_feature=True, softmax_pred=True,
        ),
        mesh=mesh, in_specs=(specs, P(), P()), out_specs=P(),
    )
    out = tp_fwd(sharded, tokens, dkey)
    np.testing.assert_allclose(np.asarray(out["score"]), np.asarray(ref["score"]), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["feature"]), np.asarray(ref["feature"]), rtol=2e-5, atol=1e-6)

    ref_loss, ref_grads = jax.value_and_grad(lg.dis_loss)(
        params, tokens, labels, LG_CFG, dkey
    )
    tp_loss_fn = shard_map(
        lambda p, t, l, k: gan_tp.leakgan_dis_loss_tp(p, t, l, LG_CFG, k),
        mesh=mesh, in_specs=(specs, P(), P(), P()), out_specs=P(),
    )
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(tp_loss_fn))(
        sharded, tokens, labels, dkey
    )
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        tp_grads, ref_grads,
    )


def test_crnngan_tp_forward_and_grads_match():
    """Hidden-split bi-LSTM discriminator (parallel/rnn_tp.py) must match
    the replicated forward exactly on the un-repacked params, and the TP
    grads must equal the reference grads after the same gate repacking."""
    from music_tpu.models import crnngan as cg

    cfg = cg.CRnnGanConfig(noise_dim=8, hidden_dim=16, song_length=12)
    m = 2
    mesh = _tp_mesh(m)
    params = cg.init_discriminator(jax.random.PRNGKey(0), cfg)
    repacked = gan_tp.repack_crnngan_d(params, m)
    # repack is invertible
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        gan_tp.unpack_crnngan_d(repacked, m), params,
    )
    specs = gan_tp.crnngan_d_specs()
    sharded = _shard(mesh, repacked, specs)
    events = jax.random.normal(jax.random.PRNGKey(1), (3, 12, 4))

    ref_dec, ref_feat = cg.discriminator_forward(params, events, cfg)
    tp_fwd = shard_map(
        lambda p, e: gan_tp.crnngan_forward_tp(p, e, cfg),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
    )
    dec, feat = tp_fwd(sharded, events)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(ref_dec), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref_feat), rtol=2e-5, atol=1e-6)

    # grads through the TP loss == repacked reference grads
    fake = jax.random.normal(jax.random.PRNGKey(2), (3, 12, 4))
    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: cg.d_loss(p, events, fake, cfg)
    )(params)
    ref_grads_rp = gan_tp.repack_crnngan_d(ref_grads, m)
    tp_loss_fn = shard_map(
        lambda p: cg.d_loss(
            p, events, fake, cfg, d_forward=gan_tp.crnngan_forward_tp
        ),
        mesh=mesh, in_specs=(specs,), out_specs=P(),
    )
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(tp_loss_fn))(sharded)
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        ),
        tp_grads, ref_grads_rp,
    )
