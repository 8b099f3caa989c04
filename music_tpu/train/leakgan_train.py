"""LeakGAN training orchestration.

Parity surface: leak_gan/train.py — per-module Adam optimizers + StepLR
schedulers (:60-90), interleaved Manager/Worker pretraining (:93-154),
negative-sample generation to .npy (:157-165), discriminator pretraining
(:168-207), adversarial alternation (:210-320), monolithic full-training-
state checkpoints (:323-337).

Reference bugs NOT replicated (docs/DIVERGENCES.md): the discarded
``torch.autograd.grad`` results that left .grad unpopulated before
optimizer.step() (:129-131,136-138,261-265), the cpkt/ckpt rotation typo
(:325-332), and ``main()``'s ``prepare_optimizer_dict`` typo (:364).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.core.optim import step_lr
from music_tpu.core.prng import KeySeq
from music_tpu.data.tokens import token_batches
from music_tpu.models import leakgan as lg
from music_tpu.models import seqgan as sg


@dataclasses.dataclass
class LeakGanTrainConfig:
    """leak_gan/params/train_params.json (repaired) defaults."""

    cfg: lg.LeakGanConfig = dataclasses.field(default_factory=lg.LeakGanConfig)
    batch_size: int = 64
    m_lr: float = 1.5e-3
    w_lr: float = 1.5e-3
    d_lr: float = 5e-5
    decay_step_size: int = 200
    decay_rate: float = 0.99
    grad_clip: float = 5.0
    rollout_num: int = 4
    generated_num: int = 1024
    # opt-in stabilizer (default 1.0 = the reference's protocol,
    # leak_gan/train.py:210-320): scale the Manager/Worker learning rate
    # for ADVERSARIAL updates only.  Adam is gradient-scale-invariant, so
    # taming the policy-gradient step requires an LR knob, not a loss
    # weight; pretrain/interleaved supervision keeps the full LR.
    adv_lr_scale: float = 1.0
    # opt-in reward shaping (default 16.0 = the reference's rank-rescale
    # sharpness, leak_gan/utils.py:461-475): the rescaled reward is
    # sigmoid(delta * (0.5 - rank/B)), so delta is the TEMPERATURE of the
    # rank distribution — at 16 the top/bottom of the batch saturate to
    # ~1/0 (near-binary rewards drive the real-corpus collapse); smaller
    # deltas keep mid-rank gradient signal.
    reward_delta: float = 16.0
    # target-LSTM oracle init: "normal" = N(0,1) for EVERY parameter
    # (leak_gan/target.py:30-32), giving oracle NLL range to move in;
    # "torch" (module defaults) yields a near-uniform oracle whose NLL is
    # pinned at its ln(V) entropy floor (VERDICT r2)
    oracle_init: str = "normal"


class LeakGanTrainer:
    """With ``mesh`` (a ``data``-axis Mesh), the fused phases run under
    shard_map: corpus sharded over ``data``, per-shard PRNG streams, pmean'd
    grads before each update.  The rollout reward's rank-rescale all_gathers
    D scores over the data axis so ranks are computed over the GLOBAL batch,
    matching the reference's single-batch semantics exactly
    (leak_gan/utils.py:461-475)."""

    def __init__(self, tc: LeakGanTrainConfig, seed: int = 0, mesh: Mesh | None = None):
        self.tc = tc
        cfg = tc.cfg
        self.mesh = mesh
        axis = "data" if mesh is not None and mesh.shape.get("data", 1) > 1 else None
        self.axis = axis
        self.keys = KeySeq(seed)
        self.g_params = lg.init_generator(self.keys.next(), cfg, tc.batch_size)
        self.d_params = lg.init_discriminator(self.keys.next(), cfg)

        # model-axis split of the 1720-filter leaked-feature discriminator
        # (parallel/gan_tp.py): D params/opt shard over ``model``; every
        # engine pass (feature leaks included) runs the TP forward
        self.tp = mesh is not None and mesh.shape.get("model", 1) > 1
        if self.tp:
            from jax.sharding import NamedSharding

            from music_tpu.parallel import gan_tp

            self._gan_tp = gan_tp
            self._d_specs = gan_tp.discriminator_specs(cfg)
            self.d_params = jax.tree_util.tree_map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                self.d_params, self._d_specs,
            )
        else:
            self._gan_tp = None
            self._d_specs = P()
        # oracle for the NLL metric (leak_gan/target.py protocol): a
        # randomly-initialized LSTM LM over the same vocab, N(0,1)-init'd
        # per target.py:30-32 so its conditionals are peaked (tc.oracle_init)
        self.oracle_cfg = sg.GeneratorConfig(
            vocab_size=cfg.vocab_size, emb_dim=cfg.worker_emb_dim,
            hidden_dim=cfg.worker_hidden, seq_len=cfg.seq_len,
            start_token=cfg.start_token,
        )
        self.oracle_params = sg.init_generator(
            self.keys.next(), self.oracle_cfg, init=tc.oracle_init
        )

        def tx(lr):
            return optax.chain(
                optax.clip_by_global_norm(tc.grad_clip),
                optax.adam(step_lr(lr, tc.decay_step_size, tc.decay_rate)),
            )

        self.m_tx, self.w_tx = tx(tc.m_lr), tx(tc.w_lr)
        # adversarial-only LR scale (tc.adv_lr_scale): same transform
        # structure, so the shared Adam state stays checkpoint-compatible
        self.m_tx_adv = tx(tc.m_lr * tc.adv_lr_scale)
        self.w_tx_adv = tx(tc.w_lr * tc.adv_lr_scale)
        # with tp the global-norm clip is applied manually (vma-aware);
        # optax's chained clip would compute a per-shard norm over the
        # model-sharded D leaves
        # identity placeholder keeps the opt-state structure identical to
        # the non-tp chain (checkpoint compatibility across trainer modes)
        self.d_tx = (
            optax.chain(
                optax.identity(),
                optax.adam(step_lr(tc.d_lr, tc.decay_step_size, tc.decay_rate)),
            )
            if self.tp else tx(tc.d_lr)
        )
        self.m_opt = self.m_tx.init(self.g_params["manager"])
        self.w_opt = self.w_tx.init(self.g_params["worker"])
        self.d_opt = self.d_tx.init(self.d_params)
        if self.tp:
            pdef = jax.tree_util.tree_structure(self.d_params)

            def _is_param_tree(x):
                return jax.tree_util.tree_structure(x) == pdef

            self._d_opt_specs = jax.tree_util.tree_map(
                lambda x: self._d_specs if _is_param_tree(x) else P(),
                self.d_opt, is_leaf=_is_param_tree,
            )
        else:
            self._d_opt_specs = P()
        self._build_steps()

    def _build_steps(self):
        cfg = self.tc.cfg
        axis, mesh = self.axis, self.mesh
        d_specs, d_opt_specs = self._d_specs, self._d_opt_specs
        if self.tp:
            gan_tp = self._gan_tp
            d_forward = gan_tp.leakgan_forward_tp

            def dis_loss_fn(p, toks, labs, k):
                return gan_tp.leakgan_dis_loss_tp(p, toks, labs, cfg, k)

            def _spec_has_model(sp):
                return any(
                    e == "model" or (isinstance(e, tuple) and "model" in e)
                    for e in sp
                )

            def clip_d_grads(grads):
                """vma-aware global-norm clip (see seqgan_train for the
                rationale): sharded leaves' squared sums psum over model
                so the norm covers the full tensors and the scale is
                replication-safe."""
                sq = 0.0
                for g, sp in zip(
                    jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(
                        d_specs, is_leaf=lambda x: isinstance(x, P)
                    ),
                ):
                    ss = jnp.sum(jnp.square(g))
                    sq = sq + (
                        jax.lax.psum(ss, "model") if _spec_has_model(sp) else ss
                    )
                norm = jnp.sqrt(sq)
                clip = self.tc.grad_clip
                scale = jnp.where(norm < clip, 1.0, clip / norm)
                return jax.tree_util.tree_map(lambda g: g * scale, grads)
        else:
            d_forward = None

            def dis_loss_fn(p, toks, labs, k):
                return lg.dis_loss(p, toks, labs, cfg, k)

            clip_d_grads = None

        def pmean(tree):
            return jax.lax.pmean(tree, axis) if axis else tree

        def localize(key):
            return (
                jax.random.fold_in(key, jax.lax.axis_index(axis)) if axis else key
            )

        def shardify(body, in_specs, out_specs):
            if mesh is None or (axis is None and not self.tp):
                return body
            return shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

        @jax.jit
        def pre_step(g_params, d_params, m_opt, w_opt, real_data, key, dkey):
            """Joint Manager (cosine-to-feature-delta) + Worker (NLL)
            pretraining update (leak_gan/train.py:116-147, with real
            gradients)."""

            def m_loss(m_params):
                rets = lg.pre_engine(
                    {"manager": m_params, "worker": g_params["worker"]},
                    d_params, real_data, key, cfg=cfg, dropout_key=dkey,
                    d_forward=d_forward,
                )
                return lg.pre_manager_loss(rets["real_goal"], rets["delta_feature"])

            def w_loss(w_params):
                rets = lg.pre_engine(
                    {"manager": g_params["manager"], "worker": w_params},
                    d_params, real_data, key, cfg=cfg, dropout_key=dkey,
                    d_forward=d_forward,
                )
                return lg.pre_worker_loss(real_data, rets["prediction"], cfg.vocab_size)

            ml, m_grads = jax.value_and_grad(m_loss)(g_params["manager"])
            wl, w_grads = jax.value_and_grad(w_loss)(g_params["worker"])
            (ml, m_grads, wl, w_grads) = pmean((ml, m_grads, wl, w_grads))
            m_updates, m_opt = self.m_tx.update(m_grads, m_opt)
            w_updates, w_opt = self.w_tx.update(w_grads, w_opt)
            new_g = {
                "manager": optax.apply_updates(g_params["manager"], m_updates),
                "worker": optax.apply_updates(g_params["worker"], w_updates),
            }
            return new_g, m_opt, w_opt, ml, wl

        def pre_phase_impl(g_params, d_params, m_opt, w_opt, real_data, key, *, epochs):
            """Generator pretraining epochs fused on-device: shuffled
            minibatch Manager/Worker updates via nested lax.scan."""
            key = localize(key)
            N, T = real_data.shape
            B = self.tc.batch_size
            n_batches = N // B

            def one_batch(carry, inp):
                g_params, m_opt, w_opt = carry
                batch, key_b, dkey_b = inp
                g_params, m_opt, w_opt, ml, wl = pre_step(
                    g_params, d_params, m_opt, w_opt, batch, key_b, dkey_b
                )
                return (g_params, m_opt, w_opt), (ml, wl)

            def one_epoch(carry, key_e):
                g_params, m_opt, w_opt = carry
                k_perm, k_eng, k_drop = jax.random.split(key_e, 3)
                perm = jax.random.permutation(k_perm, N)[: n_batches * B]
                batches = real_data[perm].reshape(n_batches, B, T)
                carry, (mls, wls) = jax.lax.scan(
                    one_batch, (g_params, m_opt, w_opt),
                    (batches, jax.random.split(k_eng, n_batches),
                     jax.random.split(k_drop, n_batches)),
                )
                return carry, (mls[-1], wls[-1])

            (g_params, m_opt, w_opt), (mls, wls) = jax.lax.scan(
                one_epoch, (g_params, m_opt, w_opt), jax.random.split(key, epochs)
            )
            return g_params, m_opt, w_opt, mls[-1], wls[-1]

        @functools.partial(jax.jit, static_argnames=("epochs",))
        def pre_phase(g_params, d_params, m_opt, w_opt, real_data, key, *, epochs):
            body = shardify(
                functools.partial(pre_phase_impl, epochs=epochs),
                in_specs=(P(), d_specs, P(), P(), P("data", None), P()),
                out_specs=(P(), P(), P(), P(), P()),
            )
            return body(g_params, d_params, m_opt, w_opt, real_data, key)

        @jax.jit
        def d_step(d_params, d_opt, tokens, labels, dkey):
            loss, grads = jax.value_and_grad(lg.dis_loss)(
                d_params, tokens, labels, cfg, dkey
            )
            updates, d_opt = self.d_tx.update(grads, d_opt)
            return optax.apply_updates(d_params, updates), d_opt, loss

        def d_phase_impl(d_params, d_opt, g_params, real_data, key, *, epochs):
            """Whole D-retraining phase on-device: regenerate negatives with
            the current generator, then ``epochs`` shuffled CE epochs — one
            compiled program instead of per-batch host calls
            (leak_gan/train.py:168-207, 280-305)."""
            key = localize(key)
            N, T = real_data.shape
            B = self.tc.batch_size
            n_batches = (2 * N) // B

            k_gen, k_tr = jax.random.split(key)
            n_gen_calls = -(-N // B)

            # scan (not unroll) the negative-regeneration calls: a real
            # corpus is ~10k rows = 157 generation scans, which would
            # otherwise explode trace/compile time
            def gen_one(_, k):
                return 0, lg.gen_samples(
                    g_params, d_params, k, B, cfg=cfg,
                    temperature=cfg.temperature, d_forward=d_forward,
                )

            _, negs = jax.lax.scan(
                gen_one, 0,
                jax.vmap(lambda i: jax.random.fold_in(k_gen, i))(
                    jnp.arange(n_gen_calls)
                ),
            )
            negative = negs.reshape(n_gen_calls * B, T)[:N]
            tokens = jnp.concatenate([real_data, negative])
            labels = jnp.concatenate(
                [jnp.ones((N,), jnp.int32), jnp.zeros((N,), jnp.int32)]
            )

            def one_batch(carry, inp):
                d_params, d_opt = carry
                toks_b, labs_b, key_b = inp
                loss, grads = jax.value_and_grad(dis_loss_fn)(
                    d_params, toks_b, labs_b, key_b
                )
                loss, grads = pmean((loss, grads))
                if clip_d_grads is not None:
                    grads = clip_d_grads(grads)
                updates, d_opt = self.d_tx.update(grads, d_opt)
                return (optax.apply_updates(d_params, updates), d_opt), loss

            def one_epoch(carry, key_e):
                d_params, d_opt = carry
                k_perm, k_drop = jax.random.split(key_e)
                perm = jax.random.permutation(k_perm, 2 * N)[: n_batches * B]
                toks = tokens[perm].reshape(n_batches, B, T)
                labs = labels[perm].reshape(n_batches, B)
                (d_params, d_opt), losses = jax.lax.scan(
                    one_batch, (d_params, d_opt),
                    (toks, labs, jax.random.split(k_drop, n_batches)),
                )
                return (d_params, d_opt), losses[-1]

            (d_params, d_opt), losses = jax.lax.scan(
                one_epoch, (d_params, d_opt), jax.random.split(k_tr, epochs)
            )
            return d_params, d_opt, losses[-1]

        @functools.partial(jax.jit, static_argnames=("epochs",))
        def d_phase(d_params, d_opt, g_params, real_data, key, *, epochs):
            body = shardify(
                functools.partial(d_phase_impl, epochs=epochs),
                in_specs=(d_specs, d_opt_specs, P(), P("data", None), P()),
                out_specs=(d_specs, d_opt_specs, P()),
            )
            return body(d_params, d_opt, g_params, real_data, key)

        def adv_step_impl(g_params, d_params, m_opt, w_opt, key, dkey):
            """Adversarial G update (leak_gan/train.py:226-266): one 'adv'
            pass, rollout rewards, manager + worker policy losses."""
            k1, k2 = jax.random.split(localize(key))

            def losses(gp):
                rets = lg.adv_engine(
                    gp, d_params, k1, self.tc.batch_size, cfg=cfg,
                    temperature=cfg.temperature, dropout_key=dkey,
                    d_forward=d_forward,
                )
                rewards = lg.get_rewards(
                    gp, d_params, rets["gen_token"], k2, cfg=cfg,
                    rollout_num=self.tc.rollout_num, temperature=cfg.temperature,
                    delta=self.tc.reward_delta,
                    axis_name=axis,  # rank over the GLOBAL dp batch
                    d_forward=d_forward,
                )
                ml = lg.adv_manager_loss(rewards, rets["real_goal"], rets["delta_feature"])
                wl = lg.adv_worker_loss(
                    rets["all_goal"], rets["delta_feature_for_worker"],
                    rets["gen_token"], rets["prediction"], cfg.vocab_size,
                )
                return ml + wl, (ml, wl)

            (total, (ml, wl)), grads = jax.value_and_grad(losses, has_aux=True)(g_params)
            (ml, wl, grads) = pmean((ml, wl, grads))
            m_updates, m_opt = self.m_tx_adv.update(grads["manager"], m_opt)
            w_updates, w_opt = self.w_tx_adv.update(grads["worker"], w_opt)
            new_g = {
                "manager": optax.apply_updates(g_params["manager"], m_updates),
                "worker": optax.apply_updates(g_params["worker"], w_updates),
            }
            return new_g, m_opt, w_opt, ml, wl

        @jax.jit
        def adv_step(g_params, d_params, m_opt, w_opt, key, dkey):
            body = shardify(
                adv_step_impl,
                in_specs=(P(), d_specs, P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P(), P()),
            )
            return body(g_params, d_params, m_opt, w_opt, key, dkey)

        @jax.jit
        def oracle_nll(oracle_params, g_params, d_params, key):
            samples = lg.gen_samples(
                g_params, d_params, key, self.tc.batch_size, cfg=cfg,
                temperature=cfg.temperature,
            )
            return sg.generator_nll(oracle_params, samples, self.oracle_cfg)

        @jax.jit
        def eval_nll_fn(g_params, d_params, data, key):
            """Teacher-forced per-token generator NLL (nats) on held-out
            sequences — the real-corpus quality metric (the reference ships
            eval_corpus.npy for exactly this; its pre_worker loss is the
            V-diluted variant, utils.py:506-514)."""
            rets = lg.pre_engine(
                g_params, d_params, data, key, cfg=cfg, d_forward=d_forward
            )
            p = jnp.clip(rets["prediction"], 1e-20, 1.0)
            picked = jnp.take_along_axis(
                jnp.log(p), data[..., None], axis=-1
            )
            return -jnp.mean(picked)

        self._pre_step = pre_step
        self._pre_phase = pre_phase
        self._d_step = d_step
        self._d_phase = d_phase
        self._adv_step = adv_step
        self._oracle_nll = oracle_nll
        self._eval_nll = eval_nll_fn

    # ------------------------------------------------------------------

    def _put_batch(self, arr):
        """Device-put with data-axis sharding; under multi-process each
        host contributes only its own rows (parallel/multihost.py)."""
        if self.mesh is not None:
            from music_tpu.parallel import multihost

            return multihost.put_global_batch(self.mesh, np.asarray(arr))
        return jnp.asarray(arr)

    def generate_samples(self, n: int, out_path: str | Path | None = None) -> np.ndarray:
        """Negative samples; .npy artifact parity (leak_gan/train.py:157-165)."""
        cfg = self.tc.cfg
        out = []
        for _ in range(-(-n // self.tc.batch_size)):
            out.append(
                np.asarray(
                    lg.gen_samples(
                        self.g_params, self.d_params, self.keys.next(),
                        self.tc.batch_size, cfg=cfg, temperature=cfg.temperature,
                    )
                )
            )
        samples = np.concatenate(out)[:n]
        if out_path is not None:
            Path(out_path).parent.mkdir(parents=True, exist_ok=True)
            np.save(out_path, samples)
        return samples

    def pretrain_generator(self, real_data: np.ndarray, epochs: int = 1):
        """Interleaved Manager/Worker pretraining — fused epochs."""
        n = (len(real_data) // self.tc.batch_size) * self.tc.batch_size
        if n == 0:
            raise ValueError("real_data smaller than one batch")
        self.g_params, self.m_opt, self.w_opt, ml, wl = self._pre_phase(
            self.g_params, self.d_params, self.m_opt, self.w_opt,
            self._put_batch(np.asarray(real_data[:n], np.int32)),
            self.keys.next(), epochs=epochs,
        )
        return float(ml), float(wl)

    def pretrain_discriminator(self, real_data: np.ndarray, epochs: int = 1):
        """Negatives + shuffled CE epochs — one device program per call."""
        n = (len(real_data) // self.tc.batch_size) * self.tc.batch_size
        if n == 0:
            raise ValueError("real_data smaller than one batch")
        self.d_params, self.d_opt, loss = self._d_phase(
            self.d_params, self.d_opt, self.g_params,
            self._put_batch(np.asarray(real_data[:n], np.int32)),
            self.keys.next(), epochs=epochs,
        )
        return float(loss)

    def adversarial_epoch(self, real_data: np.ndarray, d_steps: int = 5,
                          d_epochs: int = 3,
                          interleave_supervision: int = 0,
                          d_freeze_refresh: int = 0):
        """One adversarial round (leak_gan/train.py:210-320): G update with
        rollout rewards, then D retraining on fresh negatives.

        ``interleave_supervision``: opt-in teacher-forcing epochs run right
        after the adversarial G update (the LeakGAN paper's alternation of
        adversarial and supervised epochs; the reference's plain-alternation
        protocol — leak_gan/train.py:210-320 — has no stabilizer and
        mode-collapses on the real corpus, docs/DIVERGENCES.md #19).  D then
        retrains against the supervised-updated G.  Returns the adversarial
        manager/worker losses (supervision progress shows up in eval NLL).

        ``d_freeze_refresh=K`` (opt-in; 0 = the reference's live-critic
        protocol): the G update reads its leaked features AND rollout
        rewards from a SNAPSHOT of D refreshed every K adversarial epochs,
        so the generator optimizes against a stationary critic for K
        updates while the live D keeps training on fresh negatives — the
        policy-gradient analog of a target network (divergence #19's
        second stabilizer; the leaked-feature input distribution shifting
        under G every epoch is a collapse driver on the real corpus).

        The snapshot and its age are deliberately NOT part of ``state()``
        (they would double the checkpoint's D footprint): a resumed run
        re-snapshots the critic from the restored live D on its first
        post-resume epoch, i.e. resume RESETS the freeze window.  The
        critic is a K-epoch-stale copy of D either way, so trajectories
        stay statistically equivalent, just not step-identical."""
        if d_freeze_refresh > 0:
            if (
                getattr(self, "_frozen_d", None) is None
                or self._freeze_age >= d_freeze_refresh
            ):
                self._frozen_d = jax.tree.map(lambda a: a, self.d_params)
                self._freeze_age = 0
            self._freeze_age += 1
            d_for_g = self._frozen_d
        else:
            self._frozen_d = None
            d_for_g = self.d_params
        self.g_params, self.m_opt, self.w_opt, ml, wl = self._adv_step(
            self.g_params, d_for_g, self.m_opt, self.w_opt,
            self.keys.next(), self.keys.next(),
        )
        if interleave_supervision:
            self.pretrain_generator(real_data, epochs=interleave_supervision)
        d_loss = 0.0
        for _ in range(d_steps):
            d_loss = self.pretrain_discriminator(real_data, epochs=d_epochs)
        return float(ml), float(wl), d_loss

    def oracle_nll(self) -> float:
        return float(
            self._oracle_nll(
                self.oracle_params, self.g_params, self.d_params, self.keys.next()
            )
        )

    def oracle_samples(self, n: int) -> np.ndarray:
        """Synthetic "real" data drawn from the oracle — the closed-loop
        corpus of the target-LSTM protocol (leak_gan/target.py:115-116)."""
        out = []
        for _ in range(-(-n // self.tc.batch_size)):
            out.append(
                np.asarray(
                    sg.generate(
                        self.oracle_params, self.keys.next(), self.oracle_cfg,
                        self.tc.batch_size,
                    )
                )
            )
        return np.concatenate(out)[:n]

    def eval_nll(self, data: np.ndarray) -> float:
        """Mean teacher-forced per-token NLL (nats) of the generator over
        held-out sequences, processed in whole batches (goal_init is a
        per-batch-row parameter, model.py:149-151)."""
        bs = self.tc.batch_size
        n = (len(data) // bs) * bs
        if n == 0:
            raise ValueError("data smaller than one batch")
        data = np.asarray(data[:n], np.int32)
        vals = [
            float(
                self._eval_nll(
                    self.g_params, self.d_params,
                    jnp.asarray(data[lo : lo + bs]), self.keys.next(),
                )
            )
            for lo in range(0, n, bs)
        ]
        return float(np.mean(vals))

    # ------------------------------------------------------------------

    def state(self) -> dict[str, Any]:
        """Full training state (leak_gan/train.py:323-337 monolithic
        checkpoint, via the unified checkpoint subsystem)."""
        return {
            "g_params": self.g_params,
            "d_params": self.d_params,
            "m_opt": self.m_opt,
            "w_opt": self.w_opt,
            "d_opt": self.d_opt,
        }

    def save(self, ckpt_dir: str | Path, step: int, max_checkpoints: int = 10):
        ckpt_lib.save(ckpt_dir, step, self.state(), max_checkpoints=max_checkpoints)

    def restore(self, ckpt_dir: str | Path) -> int:
        state, step = ckpt_lib.restore_or_init(ckpt_dir, self.state())
        self.g_params = state["g_params"]
        self.d_params = state["d_params"]
        self.m_opt = state["m_opt"]
        self.w_opt = state["w_opt"]
        self.d_opt = state["d_opt"]
        return step
