"""C-RNN-GAN training orchestration (the reference's train.py is a stub —
built to the intended design, docs/DIVERGENCES.md #15).

Flow: feature-normalize MIDI event tensors -> G pretrain (MSE regression)
-> alternating GAN epochs with the paper's freezing rule (skip D updates
while it is too strong) and feature matching for G when D saturates.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.core.prng import KeySeq
from music_tpu.models import crnngan as cg


@dataclasses.dataclass
class CRnnGanTrainConfig:
    cfg: cg.CRnnGanConfig = dataclasses.field(default_factory=cg.CRnnGanConfig)
    batch_size: int = 4
    g_lr: float = 1e-3
    d_lr: float = 1e-3
    grad_clip: float = 5.0
    d_too_strong: float = 0.9   # freeze D above this real-accuracy
    feature_matching_below: float = 0.1  # use FM loss when D(fake) below


class FeatureScaler:
    """Per-feature affine normalization of event tensors (tick/length/freq/
    velocity live on very different scales); invertible for generation."""

    def __init__(self, data: np.ndarray):
        flat = data.reshape(-1, data.shape[-1])
        self.mean = flat.mean(axis=0)
        self.std = flat.std(axis=0) + 1e-6

    def transform(self, x):
        return (x - self.mean) / self.std

    def inverse(self, x):
        return x * self.std + self.mean


class CRnnGanTrainer:
    def __init__(self, tc: CRnnGanTrainConfig, seed: int = 0):
        self.tc = tc
        self.keys = KeySeq(seed)
        cfg = tc.cfg
        self.g_params = cg.init_generator(self.keys.next(), cfg)
        self.d_params = cg.init_discriminator(self.keys.next(), cfg)
        self.g_tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), optax.adam(tc.g_lr))
        self.d_tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), optax.adam(tc.d_lr))
        self.g_opt = self.g_tx.init(self.g_params)
        self.d_opt = self.d_tx.init(self.d_params)

        @jax.jit
        def pre_step(g_params, g_opt, real, key):
            loss, grads = jax.value_and_grad(cg.g_pretrain_loss)(g_params, key, real, cfg)
            upd, g_opt = self.g_tx.update(grads, g_opt)
            return optax.apply_updates(g_params, upd), g_opt, loss

        @jax.jit
        def gan_step(g_params, d_params, g_opt, d_opt, real, key):
            """One alternation: D BCE step (gated on D strength) + G step
            (adversarial or feature-matching, gated on D(fake))."""
            k1, k2, k3, k4 = jax.random.split(key, 4)
            fake = cg.generate(g_params, k1, cfg, real.shape[0])
            p_real, _ = cg.discriminator_forward(d_params, real, cfg)
            p_fake, _ = cg.discriminator_forward(d_params, fake, cfg)
            d_acc = 0.5 * (jnp.mean(p_real > 0.5) + jnp.mean(p_fake < 0.5))

            def train_d(_):
                loss, grads = jax.value_and_grad(
                    lambda dp: cg.d_loss(dp, real, fake, cfg)
                )(d_params)
                upd, new_opt = self.d_tx.update(grads, d_opt)
                return optax.apply_updates(d_params, upd), new_opt, loss

            def skip_d(_):
                return d_params, d_opt, cg.d_loss(d_params, real, fake, cfg)

            new_d, new_d_opt, dl = jax.lax.cond(
                d_acc < self.tc.d_too_strong, train_d, skip_d, None
            )

            def g_fm(gp):
                return cg.g_feature_matching_loss(gp, new_d, k2, real, cfg)

            def g_adv(gp):
                return cg.g_adv_loss(gp, new_d, k3, real.shape[0], cfg)

            use_fm = jnp.mean(p_fake) < self.tc.feature_matching_below

            def g_loss(gp):
                return jax.lax.cond(use_fm, g_fm, g_adv, gp)

            gl, g_grads = jax.value_and_grad(g_loss)(g_params)
            upd, new_g_opt = self.g_tx.update(g_grads, g_opt)
            new_g = optax.apply_updates(g_params, upd)
            return new_g, new_d, new_g_opt, new_d_opt, gl, dl, d_acc

        self._pre_step = pre_step
        self._gan_step = gan_step

    def pretrain(self, data: np.ndarray, epochs: int = 1) -> float:
        B = self.tc.batch_size
        last = 0.0
        for epoch in range(epochs):
            order = np.random.default_rng(epoch).permutation(len(data))
            for i in range(0, len(data) - B + 1, B):
                batch = jnp.asarray(data[order[i : i + B]])
                self.g_params, self.g_opt, loss = self._pre_step(
                    self.g_params, self.g_opt, batch, self.keys.next()
                )
                last = float(loss)
        return last

    def gan_epoch(self, data: np.ndarray):
        B = self.tc.batch_size
        gl = dl = acc = 0.0
        n = 0
        order = np.random.default_rng(0).permutation(len(data))
        for i in range(0, len(data) - B + 1, B):
            batch = jnp.asarray(data[order[i : i + B]])
            (self.g_params, self.d_params, self.g_opt, self.d_opt,
             g_loss, d_loss, d_acc) = self._gan_step(
                self.g_params, self.d_params, self.g_opt, self.d_opt,
                batch, self.keys.next(),
            )
            gl, dl, acc = float(g_loss), float(d_loss), float(d_acc)
            n += 1
        return gl, dl, acc

    def state(self):
        return {
            "g_params": self.g_params, "d_params": self.d_params,
            "g_opt": self.g_opt, "d_opt": self.d_opt,
        }

    def save(self, ckpt_dir: str | Path, step: int):
        ckpt_lib.save(ckpt_dir, step, self.state())

    def restore(self, ckpt_dir: str | Path) -> int:
        state, step = ckpt_lib.restore_or_init(ckpt_dir, self.state())
        self.g_params, self.d_params = state["g_params"], state["d_params"]
        self.g_opt, self.d_opt = state["g_opt"], state["d_opt"]
        return step
