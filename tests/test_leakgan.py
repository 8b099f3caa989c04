"""LeakGAN: component shapes, goal bookkeeping, engines, rewards, losses,
end-to-end training steps — the TPU-native equivalent of leak_gan/test.py's
per-component harness (test.py:84-330)."""

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.models import leakgan as lg
from music_tpu.train.leakgan_train import LeakGanTrainConfig, LeakGanTrainer

CFG = lg.LeakGanConfig(
    vocab_size=40,
    seq_len=10,
    step_size=5,
    goal_size=4,
    worker_emb_dim=8,
    worker_hidden=8,
    manager_hidden=8,
    dis_emb_dim=8,
    filter_sizes=(1, 2, 3),
    num_filters=(8, 8, 16),
    dropout=0.2,
)
B = 4


def _params(seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    return lg.init_generator(k1, CFG, B), lg.init_discriminator(k2, CFG)


def test_goal_out_size_derivation():
    # the goal_out_size = sum(num_filters) wiring (leak_gan/train.py:45-49)
    assert CFG.goal_out_size == 32
    assert lg.LeakGanConfig().goal_out_size == 1720


def test_discriminator_forward_contract():
    _, d = _params()
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, 10), 0, 41)  # incl pad
    out = lg.discriminator_forward(d, toks, CFG)
    assert out["pred"].shape == (B, 2)
    assert out["feature"].shape == (B, CFG.goal_out_size)
    np.testing.assert_allclose(np.asarray(out["pred"].sum(-1)), 1.0, rtol=1e-5)


def test_renorm_unit_ball():
    x = jnp.asarray([[3.0, 4.0], [0.3, 0.4]])
    y = lg.renorm_unit_ball(x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=1), [1.0, 0.5], rtol=1e-6)


def test_generator_step_shapes():
    g, d = _params()
    state = lg._init_gen_state(g, B, CFG)
    f = jnp.zeros((B, CFG.goal_out_size))
    x = jnp.zeros((B,), jnp.int32)
    tok, probs, sub_goal, state2 = lg.generator_step(
        g, x, f, state, CFG, jax.random.PRNGKey(0), 1.0
    )
    assert tok.shape == (B,)
    assert probs.shape == (B, CFG.vocab_size)
    assert sub_goal.shape == (B, CFG.goal_out_size)
    # last_goal accumulated
    np.testing.assert_allclose(
        np.asarray(state2["last_goal"]), np.asarray(sub_goal), rtol=1e-6
    )


def test_pre_engine_shapes():
    g, d = _params()
    real = jax.random.randint(jax.random.PRNGKey(2), (B, 10), 1, 40)
    rets = lg.pre_engine(g, d, real, jax.random.PRNGKey(3), cfg=CFG)
    n = CFG.n_goals
    assert rets["real_goal"].shape == (B, n, CFG.goal_out_size)
    assert rets["delta_feature"].shape == (B, n, CFG.goal_out_size)
    assert rets["prediction"].shape == (B, 10, CFG.vocab_size)
    # first goal snapshot is goal_init (no promote at t=0)
    np.testing.assert_allclose(
        np.asarray(rets["real_goal"][:, 0]),
        np.asarray(g["manager"]["goal_init"][:B]),
        rtol=1e-6,
    )


def test_adv_engine_shapes_and_token_range():
    g, d = _params()
    rets = lg.adv_engine(g, d, jax.random.PRNGKey(4), B, cfg=CFG)
    assert rets["gen_token"].shape == (B, 10)
    assert (rets["gen_token"] >= 0).all() and (rets["gen_token"] < 40).all()
    assert rets["all_goal"].shape == (B, 10, CFG.goal_out_size)
    assert rets["delta_feature_for_worker"].shape == (B, 10, CFG.goal_out_size)


def test_rollout_rewards_shape_and_range():
    g, d = _params()
    samples = jax.random.randint(jax.random.PRNGKey(5), (B, 10), 1, 40)
    r = lg.get_rewards(
        g, d, samples, jax.random.PRNGKey(6), cfg=CFG, rollout_num=2
    )
    assert r.shape == (B, CFG.n_goals)
    # rescaled sigmoid / rollout_num is in (0, 0.5)
    assert (np.asarray(r) > 0).all() and (np.asarray(r) < 0.5 + 1e-6).all()


def test_rescale_dp_matches_single_device():
    """Under a data mesh, the rank rescale must all_gather D scores and rank
    over the GLOBAL batch — dp rewards == single-device rewards for the same
    global batch (leak_gan/utils.py:461-475 ranks over its full batch)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=4, seq=1, model=1), devices=jax.devices()[:4])
    n_goals, Bg = 2, 16
    sums = jnp.asarray(
        np.random.default_rng(0).permutation(n_goals * Bg).reshape(n_goals, Bg),
        jnp.float32,
    )  # distinct values: ranks are unambiguous
    single = lg.rescale_rewards(sums)

    dp = shard_map(
        lambda s: lg.rescale_rewards(s, axis_name="data"),
        mesh=mesh, in_specs=P(None, "data"), out_specs=P(None, "data"),
    )(sums)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(single), rtol=1e-6)


def test_rollout_respects_restore_points():
    """given_num=k streams must reproduce the sample prefix exactly."""
    g, d = _params()
    samples = jax.random.randint(jax.random.PRNGKey(7), (B, 10), 1, 40)
    completions, _ = lg._engine_scan(
        g, d, CFG, jax.random.PRNGKey(8), B,
        n_steps=CFG.seq_len,
        teacher_tokens=samples,
        teacher_until=jnp.full((B,), 5),
    )
    np.testing.assert_array_equal(
        np.asarray(completions[:, :5]), np.asarray(samples[:, :5])
    )


def test_losses_finite_and_signs():
    g, d = _params()
    real = jax.random.randint(jax.random.PRNGKey(9), (B, 10), 1, 40)
    rets = lg.pre_engine(g, d, real, jax.random.PRNGKey(10), cfg=CFG)
    ml = lg.pre_manager_loss(rets["real_goal"], rets["delta_feature"])
    wl = lg.pre_worker_loss(real, rets["prediction"], CFG.vocab_size)
    assert 0.0 <= float(ml) <= 2.0   # 1 - cos in [0, 2]
    assert float(wl) > 0.0           # NLL positive
    labels = jnp.asarray([1, 0, 1, 0], jnp.int32)
    dl = lg.dis_loss(d, real, labels, CFG)
    assert np.isfinite(float(dl))


def test_end_to_end_training_steps():
    tc = LeakGanTrainConfig(cfg=CFG, batch_size=B, rollout_num=2, generated_num=8)
    tr = LeakGanTrainer(tc, seed=0)
    real = np.random.default_rng(0).integers(1, 40, (16, 10)).astype(np.int64)
    ml, wl = tr.pretrain_generator(real, epochs=1)
    assert np.isfinite(ml) and np.isfinite(wl)
    d_loss = tr.pretrain_discriminator(real, epochs=1)
    assert np.isfinite(d_loss)
    aml, awl, adl = tr.adversarial_epoch(real, d_steps=1, d_epochs=1)
    assert np.isfinite(aml) and np.isfinite(awl) and np.isfinite(adl)
    nll = tr.oracle_nll()
    assert np.isfinite(nll)


def test_worker_pretrain_reduces_nll():
    """Worker NLL on a strongly-patterned corpus must drop with pretraining."""
    tc = LeakGanTrainConfig(cfg=CFG, batch_size=B, m_lr=1e-3, w_lr=5e-3)
    tr = LeakGanTrainer(tc, seed=1)
    real = np.tile(np.arange(1, 11)[None], (32, 1)).astype(np.int64)
    _, wl0 = tr.pretrain_generator(real, epochs=1)
    for _ in range(4):
        _, wl = tr.pretrain_generator(real, epochs=1)
    assert wl < wl0, (wl0, wl)


def test_checkpoint_roundtrip(tmp_path):
    tc = LeakGanTrainConfig(cfg=CFG, batch_size=B)
    tr = LeakGanTrainer(tc, seed=2)
    tr.save(tmp_path, 7)
    tr2 = LeakGanTrainer(tc, seed=3)
    step = tr2.restore(tmp_path)
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(tr2.g_params["worker"]["goal_change"]),
        np.asarray(tr.g_params["worker"]["goal_change"]),
    )


def test_data_parallel_trainer():
    """dp mode: corpus sharded over data axis, phases run under shard_map."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=4, seq=1, model=1), devices=jax.devices()[:4])
    tc = LeakGanTrainConfig(cfg=CFG, batch_size=B, rollout_num=2, generated_num=8)
    tr = LeakGanTrainer(tc, seed=0, mesh=mesh)
    real = np.random.default_rng(0).integers(1, 40, (32, 10)).astype(np.int64)
    ml, wl = tr.pretrain_generator(real, epochs=1)
    assert np.isfinite(ml) and np.isfinite(wl)
    d_loss = tr.pretrain_discriminator(real, epochs=1)
    assert np.isfinite(d_loss)
    aml, awl, adl = tr.adversarial_epoch(real, d_steps=1, d_epochs=1)
    assert np.isfinite(aml) and np.isfinite(awl) and np.isfinite(adl)


def test_dp_tp_trainer_matches_dp_only():
    """A dp x model mesh shards the leaked-feature discriminator through
    every engine pass (parallel/gan_tp.leakgan_forward_tp) — same seeds
    must reproduce the dp-only trainer's losses to float tolerance."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    tc = LeakGanTrainConfig(cfg=CFG, batch_size=B, rollout_num=2, generated_num=8)
    mesh_dp = make_mesh(MeshSpec(data=2, seq=1, model=1), devices=jax.devices()[:2])
    mesh_tp = make_mesh(MeshSpec(data=2, seq=1, model=2), devices=jax.devices()[:4])
    tr_dp = LeakGanTrainer(tc, seed=0, mesh=mesh_dp)
    tr_tp = LeakGanTrainer(tc, seed=0, mesh=mesh_tp)
    assert tr_tp.tp and not tr_dp.tp

    real = np.random.default_rng(0).integers(1, 40, (16, 10)).astype(np.int64)
    ml_dp, wl_dp = tr_dp.pretrain_generator(real, epochs=1)
    ml_tp, wl_tp = tr_tp.pretrain_generator(real, epochs=1)
    np.testing.assert_allclose(ml_tp, ml_dp, rtol=1e-4)
    np.testing.assert_allclose(wl_tp, wl_dp, rtol=1e-4)

    d_dp = tr_dp.pretrain_discriminator(real, epochs=1)
    d_tp = tr_tp.pretrain_discriminator(real, epochs=1)
    np.testing.assert_allclose(d_tp, d_dp, rtol=1e-3)

    am_dp, aw_dp, ad_dp = tr_dp.adversarial_epoch(real, d_steps=1, d_epochs=1)
    am_tp, aw_tp, ad_tp = tr_tp.adversarial_epoch(real, d_steps=1, d_epochs=1)
    np.testing.assert_allclose(am_tp, am_dp, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(aw_tp, aw_dp, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(ad_tp, ad_dp, rtol=1e-3)

    # D params really live sharded over `model`
    assert "model" in str(tr_tp.d_params["out"]["w"].sharding.spec)


def test_eval_nll_surface():
    """eval_nll: teacher-forced per-token NLL on held-out data — finite,
    ~ln(V) at init, and (being an average of per-batch NLLs) deterministic
    in the data."""
    tc = LeakGanTrainConfig(cfg=CFG, batch_size=B)
    tr = LeakGanTrainer(tc, seed=5)
    data = np.asarray(
        jax.random.randint(jax.random.PRNGKey(9), (3 * B, CFG.seq_len), 1,
                           CFG.vocab_size), np.int32)
    nll = tr.eval_nll(data)
    assert np.isfinite(nll)
    # untrained generator on random tokens: close to the uniform floor
    assert abs(nll - np.log(CFG.vocab_size)) < 1.5


def test_oracle_init_normal_is_peaked():
    """oracle_init="normal" (target.py:30-32) must produce an oracle whose
    own samples have NLL well below ln(V) — i.e. a peaked distribution the
    metric can register improvement against (VERDICT r2 missing #2)."""
    from music_tpu.models import seqgan as sg

    ocfg = sg.GeneratorConfig(vocab_size=200, emb_dim=8, hidden_dim=8, seq_len=10)
    k = jax.random.PRNGKey(3)
    p_norm = sg.init_generator(k, ocfg, init="normal")
    p_torch = sg.init_generator(k, ocfg, init="torch")
    samples_n = sg.generate(p_norm, jax.random.PRNGKey(4), ocfg, 64)
    self_nll_norm = float(sg.generator_nll(p_norm, samples_n, ocfg))
    samples_t = sg.generate(p_torch, jax.random.PRNGKey(4), ocfg, 64)
    self_nll_torch = float(sg.generator_nll(p_torch, samples_t, ocfg))
    floor = np.log(ocfg.vocab_size)
    # torch-default oracle sits at its entropy floor; N(0,1) is peaked
    # (the gap widens with hidden_dim — ~0.9 nats already at hidden 8)
    assert abs(self_nll_torch - floor) < 0.4
    assert self_nll_norm < floor - 0.5
    assert self_nll_norm < self_nll_torch - 0.4


def test_from_json_accepts_reference_nested_schema():
    """LeakGanConfig.from_json must load the reference's NESTED params
    schema (discriminator_params / generator_params.{worker,manager}_params,
    leak_gan/params/leak_gan_params.json) as well as the flat one."""
    nested = {
        "discriminator_params": {
            "seq_len": 20, "num_classes": 2, "vocab_size": 5258,
            "dis_emb_dim": 64, "filter_sizes": [1, 2, 3],
            "num_filters": [100, 200, 160], "start_token": 0,
            "goal_out_size": None, "step_size": 5,
            "dropout_keep_prob": 0.8, "l2_reg_lambda": 0.2,
        },
        "generator_params": {
            "manager_params": {"batch_size": 64, "hidden_dim": 32,
                               "goal_out_size": None},
            "worker_params": {"batch_size": 64, "vocab_size": 5258,
                              "embed_dim": 32, "hidden_dim": 32,
                              "goal_out_size": None, "goal_size": 16},
            "step_size": 5,
        },
    }
    cfg = lg.LeakGanConfig.from_json(nested)
    assert cfg.vocab_size == 5258 and cfg.seq_len == 20
    assert cfg.filter_sizes == (1, 2, 3)
    assert cfg.num_filters == (100, 200, 160)
    assert cfg.goal_out_size == 460  # train.py:45-49 cross-wiring
    assert abs(cfg.dropout - 0.2) < 1e-9 and cfg.l2_reg_lambda == 0.2
    # flat schema still works and overrides defaults
    flat = lg.LeakGanConfig.from_json({"vocab_size": 40, "seq_len": 10,
                                       "filter_sizes": [1], "num_filters": [4]})
    assert flat.vocab_size == 40 and flat.goal_out_size == 4


def test_adversarial_stabilizer_knobs():
    """Opt-in round-5 stabilizers: a softer rank-rescale temperature
    (reward_delta) and a frozen leaked-feature/reward critic
    (d_freeze_refresh) both run and leave the default protocol intact."""
    tc = LeakGanTrainConfig(
        cfg=CFG, batch_size=B, rollout_num=2, generated_num=8,
        reward_delta=4.0,
    )
    tr = LeakGanTrainer(tc, seed=0)
    real = np.random.default_rng(5).integers(1, 40, (16, 10)).astype(np.int64)
    tr.pretrain_generator(real, epochs=1)
    tr.pretrain_discriminator(real, epochs=1)

    # frozen critic: snapshot taken on the first epoch, held for K=2
    aml, awl, _ = tr.adversarial_epoch(
        real, d_steps=1, d_epochs=1, d_freeze_refresh=2
    )
    assert np.isfinite(aml) and np.isfinite(awl)
    frozen0 = tr._frozen_d
    assert frozen0 is not None
    live_leaf = jax.tree_util.tree_leaves(tr.d_params)[0]
    froz_leaf = jax.tree_util.tree_leaves(frozen0)[0]
    # D retrained after the snapshot -> live D moved, snapshot did not
    assert not np.allclose(np.asarray(live_leaf), np.asarray(froz_leaf))
    tr.adversarial_epoch(real, d_steps=1, d_epochs=1, d_freeze_refresh=2)
    assert tr._frozen_d is frozen0  # held within the refresh window
    tr.adversarial_epoch(real, d_steps=1, d_epochs=1, d_freeze_refresh=2)
    assert tr._frozen_d is not frozen0  # refreshed after K epochs

    # turning the knob off restores the live-critic protocol
    tr.adversarial_epoch(real, d_steps=1, d_epochs=1)
    assert tr._frozen_d is None


def test_reward_delta_flattens_rescale():
    """Smaller delta = flatter rank rewards (more mid-rank gradient)."""
    sums = jnp.asarray(np.random.default_rng(7).normal(size=(2, 16)), jnp.float32)
    sharp = lg.rescale_rewards(sums, delta=16.0)
    soft = lg.rescale_rewards(sums, delta=4.0)
    assert float(jnp.ptp(soft)) < float(jnp.ptp(sharp))
    # both are rank-monotone on each restore-point row
    order = np.argsort(np.asarray(sums[0]))
    assert (np.diff(np.asarray(sharp[0])[order]) >= 0).all()
    assert (np.diff(np.asarray(soft[0])[order]) >= 0).all()
