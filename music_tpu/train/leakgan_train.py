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
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

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


class LeakGanTrainer:
    def __init__(self, tc: LeakGanTrainConfig, seed: int = 0):
        self.tc = tc
        cfg = tc.cfg
        self.keys = KeySeq(seed)
        self.g_params = lg.init_generator(self.keys.next(), cfg, tc.batch_size)
        self.d_params = lg.init_discriminator(self.keys.next(), cfg)
        # oracle for the NLL metric (leak_gan/target.py protocol): a
        # randomly-initialized LSTM LM over the same vocab
        self.oracle_cfg = sg.GeneratorConfig(
            vocab_size=cfg.vocab_size, emb_dim=cfg.worker_emb_dim,
            hidden_dim=cfg.worker_hidden, seq_len=cfg.seq_len,
            start_token=cfg.start_token,
        )
        self.oracle_params = sg.init_generator(self.keys.next(), self.oracle_cfg)

        def tx(lr):
            return optax.chain(
                optax.clip_by_global_norm(tc.grad_clip),
                optax.adam(step_lr(lr, tc.decay_step_size, tc.decay_rate)),
            )

        self.m_tx, self.w_tx, self.d_tx = tx(tc.m_lr), tx(tc.w_lr), tx(tc.d_lr)
        self.m_opt = self.m_tx.init(self.g_params["manager"])
        self.w_opt = self.w_tx.init(self.g_params["worker"])
        self.d_opt = self.d_tx.init(self.d_params)
        self._build_steps()

    def _build_steps(self):
        cfg = self.tc.cfg

        @jax.jit
        def pre_step(g_params, d_params, m_opt, w_opt, real_data, key, dkey):
            """Joint Manager (cosine-to-feature-delta) + Worker (NLL)
            pretraining update (leak_gan/train.py:116-147, with real
            gradients)."""

            def m_loss(m_params):
                rets = lg.pre_engine(
                    {"manager": m_params, "worker": g_params["worker"]},
                    d_params, real_data, key, cfg=cfg, dropout_key=dkey,
                )
                return lg.pre_manager_loss(rets["real_goal"], rets["delta_feature"])

            def w_loss(w_params):
                rets = lg.pre_engine(
                    {"manager": g_params["manager"], "worker": w_params},
                    d_params, real_data, key, cfg=cfg, dropout_key=dkey,
                )
                return lg.pre_worker_loss(real_data, rets["prediction"], cfg.vocab_size)

            ml, m_grads = jax.value_and_grad(m_loss)(g_params["manager"])
            wl, w_grads = jax.value_and_grad(w_loss)(g_params["worker"])
            m_updates, m_opt = self.m_tx.update(m_grads, m_opt)
            w_updates, w_opt = self.w_tx.update(w_grads, w_opt)
            new_g = {
                "manager": optax.apply_updates(g_params["manager"], m_updates),
                "worker": optax.apply_updates(g_params["worker"], w_updates),
            }
            return new_g, m_opt, w_opt, ml, wl

        @jax.jit
        def d_step(d_params, d_opt, tokens, labels, dkey):
            loss, grads = jax.value_and_grad(lg.dis_loss)(
                d_params, tokens, labels, cfg, dkey
            )
            updates, d_opt = self.d_tx.update(grads, d_opt)
            return optax.apply_updates(d_params, updates), d_opt, loss

        @jax.jit
        def adv_step(g_params, d_params, m_opt, w_opt, key, dkey):
            """Adversarial G update (leak_gan/train.py:226-266): one 'adv'
            pass, rollout rewards, manager + worker policy losses."""
            k1, k2 = jax.random.split(key)

            def losses(gp):
                rets = lg.adv_engine(
                    gp, d_params, k1, self.tc.batch_size, cfg=cfg,
                    temperature=cfg.temperature, dropout_key=dkey,
                )
                rewards = lg.get_rewards(
                    gp, d_params, rets["gen_token"], k2, cfg=cfg,
                    rollout_num=self.tc.rollout_num, temperature=cfg.temperature,
                )
                ml = lg.adv_manager_loss(rewards, rets["real_goal"], rets["delta_feature"])
                wl = lg.adv_worker_loss(
                    rets["all_goal"], rets["delta_feature_for_worker"],
                    rets["gen_token"], rets["prediction"], cfg.vocab_size,
                )
                return ml + wl, (ml, wl)

            (total, (ml, wl)), grads = jax.value_and_grad(losses, has_aux=True)(g_params)
            m_updates, m_opt = self.m_tx.update(grads["manager"], m_opt)
            w_updates, w_opt = self.w_tx.update(grads["worker"], w_opt)
            new_g = {
                "manager": optax.apply_updates(g_params["manager"], m_updates),
                "worker": optax.apply_updates(g_params["worker"], w_updates),
            }
            return new_g, m_opt, w_opt, ml, wl

        @jax.jit
        def oracle_nll(oracle_params, g_params, d_params, key):
            samples = lg.gen_samples(
                g_params, d_params, key, self.tc.batch_size, cfg=cfg,
                temperature=cfg.temperature,
            )
            return sg.generator_nll(oracle_params, samples, self.oracle_cfg)

        self._pre_step = pre_step
        self._d_step = d_step
        self._adv_step = adv_step
        self._oracle_nll = oracle_nll

    # ------------------------------------------------------------------

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
        last = (0.0, 0.0)
        for epoch in range(epochs):
            for batch in token_batches(real_data, self.tc.batch_size, seed=epoch):
                self.g_params, self.m_opt, self.w_opt, ml, wl = self._pre_step(
                    self.g_params, self.d_params, self.m_opt, self.w_opt,
                    jnp.asarray(batch, jnp.int32), self.keys.next(), self.keys.next(),
                )
                last = (float(ml), float(wl))
        return last

    def pretrain_discriminator(self, real_data: np.ndarray, epochs: int = 1):
        last = 0.0
        for epoch in range(epochs):
            negative = self.generate_samples(len(real_data))
            tokens = np.concatenate([real_data, negative]).astype(np.int32)
            labels = np.concatenate(
                [np.ones(len(real_data), np.int32), np.zeros(len(negative), np.int32)]
            )
            for batch_idx in token_batches(
                np.arange(len(tokens))[:, None], self.tc.batch_size, seed=epoch
            ):
                idx = batch_idx[:, 0]
                self.d_params, self.d_opt, loss = self._d_step(
                    self.d_params, self.d_opt,
                    jnp.asarray(tokens[idx]), jnp.asarray(labels[idx]), self.keys.next(),
                )
                last = float(loss)
        return last

    def adversarial_epoch(self, real_data: np.ndarray, d_steps: int = 5, d_epochs: int = 3):
        """One adversarial round (leak_gan/train.py:210-320): G update with
        rollout rewards, then D retraining on fresh negatives."""
        self.g_params, self.m_opt, self.w_opt, ml, wl = self._adv_step(
            self.g_params, self.d_params, self.m_opt, self.w_opt,
            self.keys.next(), self.keys.next(),
        )
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
