"""SeqGAN: component shapes, rollout-reward semantics, end-to-end adversarial
loop with oracle-NLL improvement from MLE pretraining."""

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.models import seqgan as sg
from music_tpu.train.seqgan_train import SeqGanConfig, SeqGanTrainer, read_samples, write_samples

G = sg.GeneratorConfig(vocab_size=50, emb_dim=8, hidden_dim=8, seq_len=10)
D = sg.DiscriminatorConfig(
    vocab_size=50, emb_dim=8, filter_sizes=(1, 2, 3), num_filters=(8, 8, 8), seq_len=10
)


def test_generator_shapes_and_sampling():
    params = sg.init_generator(jax.random.PRNGKey(0), G)
    toks = sg.generate(params, jax.random.PRNGKey(1), G, batch=4)
    assert toks.shape == (4, 10)
    assert (toks >= 0).all() and (toks < 50).all()
    logits = sg.generator_logits(params, toks, G)
    assert logits.shape == (4, 10, 50)
    nll = sg.generator_nll(params, toks, G)
    assert np.isfinite(float(nll))


def test_discriminator_shapes():
    params = sg.init_discriminator(jax.random.PRNGKey(0), D)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 50)
    out = sg.discriminator_forward(params, toks, D)
    assert out["score"].shape == (4, 2)
    assert out["feature"].shape == (4, D.feature_dim)
    p = sg.discriminator_pos_prob(params, toks, D)
    assert ((p >= 0) & (p <= 1)).all()


def test_rollout_rewards_shape_and_final_column():
    g = sg.init_generator(jax.random.PRNGKey(0), G)
    d = sg.init_discriminator(jax.random.PRNGKey(1), D)
    samples = jax.random.randint(jax.random.PRNGKey(2), (4, 10), 0, 50)
    r = sg.rollout_rewards(
        g, d, samples, jax.random.PRNGKey(3), g_cfg=G, d_cfg=D, rollout_num=3
    )
    assert r.shape == (4, 10)
    assert ((r >= 0) & (r <= 1)).all()
    # the last column is exactly D(sample) (rollout.py:44-48)
    np.testing.assert_allclose(
        np.asarray(r[:, -1]), np.asarray(sg.discriminator_pos_prob(d, samples, D)),
        rtol=1e-6,
    )


def test_teacher_forced_prefix_is_respected():
    """Rewards at early positions must depend on the sample's prefix: two
    samples differing only in late positions get identical completions
    distributions at position 0... (sanity via reward of position 0 using
    prefix length 1 -> all completions share token 0)."""
    g = sg.init_generator(jax.random.PRNGKey(0), G)
    d = sg.init_discriminator(jax.random.PRNGKey(1), D)
    s1 = jnp.zeros((2, 10), jnp.int32)
    s2 = s1.at[:, 5:].set(7)
    r1 = sg.rollout_rewards(g, d, s1, jax.random.PRNGKey(3), g_cfg=G, d_cfg=D, rollout_num=2)
    r2 = sg.rollout_rewards(g, d, s2, jax.random.PRNGKey(3), g_cfg=G, d_cfg=D, rollout_num=2)
    # same key + same prefix (length 1..4) -> identical completions/rewards
    np.testing.assert_allclose(np.asarray(r1[:, :4]), np.asarray(r2[:, :4]), rtol=1e-6)


def test_sample_file_roundtrip(tmp_path):
    samples = np.random.default_rng(0).integers(0, 50, (6, 10)).astype(np.int32)
    path = tmp_path / "samples.txt"
    write_samples(path, samples)
    np.testing.assert_array_equal(read_samples(path), samples)


def test_end_to_end_mle_improves_oracle_nll():
    cfg = SeqGanConfig(g=G, d=D, batch_size=16, generated_num=64, rollout_num=2)
    tr = SeqGanTrainer(cfg, seed=0)
    positive = tr.oracle_samples(cfg.generated_num)
    nll_before = tr.oracle_nll()
    tr.pretrain_generator(positive, epochs=8)
    nll_after = tr.oracle_nll()
    assert nll_after < nll_before, (nll_before, nll_after)


def test_adversarial_epoch_runs():
    cfg = SeqGanConfig(g=G, d=D, batch_size=16, generated_num=32, rollout_num=2)
    tr = SeqGanTrainer(cfg, seed=1)
    positive = tr.oracle_samples(cfg.generated_num)
    tr.pretrain_generator(positive, epochs=1)
    tr.train_discriminator(positive, d_steps=1, epochs=1)
    g_loss, d_loss = tr.adversarial_epoch(positive, g_steps=1, d_steps=1, d_epochs=1)
    assert np.isfinite(g_loss) and np.isfinite(d_loss)


def test_data_parallel_trainer_matches_semantics():
    """With a data-axis mesh, phases shard the corpus, diverge per-shard
    PRNG streams, and pmean grads — training must run and improve oracle
    NLL like the single-device path."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=4, seq=1, model=1), devices=jax.random and __import__("jax").devices()[:4])
    cfg = SeqGanConfig(g=G, d=D, batch_size=8, generated_num=64, rollout_num=2)
    tr = SeqGanTrainer(cfg, seed=0, mesh=mesh)
    positive = tr.oracle_samples(cfg.generated_num)
    nll_before = tr.oracle_nll()
    tr.pretrain_generator(positive, epochs=8)
    nll_after = tr.oracle_nll()
    assert nll_after < nll_before, (nll_before, nll_after)
    tr.train_discriminator(positive, d_steps=1, epochs=1)
    g_loss, d_loss = tr.adversarial_epoch(positive, g_steps=1, d_steps=1, d_epochs=1)
    assert np.isfinite(g_loss) and np.isfinite(d_loss)


def test_dp_tp_trainer_matches_dp_only():
    """A dp x model mesh shards the discriminator (parallel/gan_tp.py)
    through every phase — same seeds must reproduce the dp-only trainer's
    losses to float tolerance (the TP forward is numerically equivalent)."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    cfg = SeqGanConfig(g=G, d=D, batch_size=8, generated_num=32, rollout_num=2)
    mesh_dp = make_mesh(MeshSpec(data=2, seq=1, model=1), devices=jax.devices()[:2])
    mesh_tp = make_mesh(MeshSpec(data=2, seq=1, model=2), devices=jax.devices()[:4])

    tr_dp = SeqGanTrainer(cfg, seed=0, mesh=mesh_dp)
    tr_tp = SeqGanTrainer(cfg, seed=0, mesh=mesh_tp)
    assert tr_tp.tp and not tr_dp.tp

    positive = tr_dp.oracle_samples(cfg.generated_num)
    # advance tr_tp's key stream identically (same seed -> same samples)
    np.testing.assert_array_equal(
        tr_tp.oracle_samples(cfg.generated_num), positive
    )
    l_dp = tr_dp.pretrain_generator(positive, epochs=2)
    l_tp = tr_tp.pretrain_generator(positive, epochs=2)
    np.testing.assert_allclose(l_tp, l_dp, rtol=1e-5)

    d_dp = tr_dp.train_discriminator(positive, d_steps=1, epochs=2)
    d_tp = tr_tp.train_discriminator(positive, d_steps=1, epochs=2)
    np.testing.assert_allclose(d_tp, d_dp, rtol=1e-3)

    g_dp, dd_dp = tr_dp.adversarial_epoch(positive, g_steps=1, d_steps=1, d_epochs=1)
    g_tp, dd_tp = tr_tp.adversarial_epoch(positive, g_steps=1, d_steps=1, d_epochs=1)
    np.testing.assert_allclose(g_tp, g_dp, rtol=1e-3)
    np.testing.assert_allclose(dd_tp, dd_dp, rtol=1e-3)

    # the TP trainer's D params actually live sharded over `model`
    leaf = tr_tp.d_params["out"]["w"]
    assert "model" in str(leaf.sharding.spec)
