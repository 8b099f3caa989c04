"""C-RNN-GAN training orchestration (the reference's train.py is a stub —
built to the intended design, docs/DIVERGENCES.md #15).

Flow: feature-normalize MIDI event tensors -> G pretrain (MSE regression)
-> alternating GAN epochs with the paper's freezing rule (skip D updates
while it is too strong) and feature matching for G when D saturates.
Optionally conditions the generator on the per-song genre/composer one-hot
meta tensor (c-rnn-gan/data.py:151-157, ``CRnnGanConfig.meta_dim``).

With ``mesh`` (a ``data``-axis Mesh), both steps run under shard_map: the
event/meta batch shards over ``data``, per-shard PRNG streams diverge via
axis-index folding, and gradients — plus the D-strength / D-saturation
gate statistics, so every shard takes the same ``lax.cond`` branch — are
pmean'd over the global batch before each update.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

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
    def __init__(self, tc: CRnnGanTrainConfig, seed: int = 0, mesh: Mesh | None = None):
        self.tc = tc
        self.mesh = mesh
        axis = "data" if mesh is not None and mesh.shape.get("data", 1) > 1 else None
        self.axis = axis
        self.keys = KeySeq(seed)
        cfg = tc.cfg
        self.g_params = cg.init_generator(self.keys.next(), cfg)
        self.d_params = cg.init_discriminator(self.keys.next(), cfg)
        self.g_tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), optax.adam(tc.g_lr))
        self.d_tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), optax.adam(tc.d_lr))
        self.g_opt = self.g_tx.init(self.g_params)
        self.d_opt = self.d_tx.init(self.d_params)

        def pmean(tree):
            return jax.lax.pmean(tree, axis) if axis else tree

        def localize(key):
            return (
                jax.random.fold_in(key, jax.lax.axis_index(axis)) if axis else key
            )

        def shardify(body, in_specs, out_specs):
            if axis is None:
                return body
            return shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

        def pre_step_impl(g_params, g_opt, real, meta, key):
            key = localize(key)
            loss, grads = jax.value_and_grad(cg.g_pretrain_loss)(
                g_params, key, real, cfg, meta
            )
            loss, grads = pmean((loss, grads))
            upd, g_opt = self.g_tx.update(grads, g_opt)
            return optax.apply_updates(g_params, upd), g_opt, loss

        @jax.jit
        def pre_step(g_params, g_opt, real, meta, key):
            body = shardify(
                pre_step_impl,
                in_specs=(P(), P(), P("data", None, None), P("data", None), P()),
                out_specs=(P(), P(), P()),
            )
            return body(g_params, g_opt, real, meta, key)

        def gan_step_impl(g_params, d_params, g_opt, d_opt, real, meta, key):
            """One alternation: D BCE step (gated on D strength) + G step
            (adversarial or feature-matching, gated on D(fake)).  Gate
            statistics are pmean'd so all dp shards branch identically."""
            key = localize(key)
            k1, k2, k3 = jax.random.split(key, 3)
            fake = cg.generate(g_params, k1, cfg, real.shape[0], meta=meta)
            p_real, _ = cg.discriminator_forward(d_params, real, cfg)
            p_fake, _ = cg.discriminator_forward(d_params, fake, cfg)
            d_acc = pmean(0.5 * (jnp.mean(p_real > 0.5) + jnp.mean(p_fake < 0.5)))
            mean_p_fake = pmean(jnp.mean(p_fake))

            def train_d(_):
                loss, grads = jax.value_and_grad(
                    lambda dp: cg.d_loss(dp, real, fake, cfg)
                )(d_params)
                loss, grads = pmean((loss, grads))
                upd, new_opt = self.d_tx.update(grads, d_opt)
                return optax.apply_updates(d_params, upd), new_opt, loss

            def skip_d(_):
                return d_params, d_opt, pmean(cg.d_loss(d_params, real, fake, cfg))

            new_d, new_d_opt, dl = jax.lax.cond(
                d_acc < self.tc.d_too_strong, train_d, skip_d, None
            )

            def g_fm(gp):
                return cg.g_feature_matching_loss(
                    gp, new_d, k2, real, cfg, meta=meta, axis_name=axis
                )

            def g_adv(gp):
                return cg.g_adv_loss(gp, new_d, k3, real.shape[0], cfg, meta=meta)

            use_fm = mean_p_fake < self.tc.feature_matching_below

            def g_loss(gp):
                return jax.lax.cond(use_fm, g_fm, g_adv, gp)

            gl, g_grads = jax.value_and_grad(g_loss)(g_params)
            gl, g_grads = pmean((gl, g_grads))
            upd, new_g_opt = self.g_tx.update(g_grads, g_opt)
            new_g = optax.apply_updates(g_params, upd)
            return new_g, new_d, new_g_opt, new_d_opt, gl, dl, d_acc

        @jax.jit
        def gan_step(g_params, d_params, g_opt, d_opt, real, meta, key):
            body = shardify(
                gan_step_impl,
                in_specs=(
                    P(), P(), P(), P(),
                    P("data", None, None), P("data", None), P(),
                ),
                out_specs=(P(), P(), P(), P(), P(), P(), P()),
            )
            return body(g_params, d_params, g_opt, d_opt, real, meta, key)

        self._pre_step = pre_step
        self._gan_step = gan_step


    def _put_batch(self, arr):
        """Device-put with data-axis sharding; under multi-process each
        host contributes only its own rows (parallel/multihost.py)."""
        if self.mesh is not None:
            from music_tpu.parallel import multihost

            return multihost.put_global_batch(self.mesh, np.asarray(arr))
        return jnp.asarray(arr)

    def _meta_rows(self, meta: np.ndarray | None, idx: np.ndarray) -> jnp.ndarray:
        if meta is None:
            return jnp.zeros((len(idx), self.tc.cfg.meta_dim), jnp.float32)
        return jnp.asarray(meta[idx], jnp.float32)

    def pretrain(self, data: np.ndarray, epochs: int = 1,
                 meta: np.ndarray | None = None) -> float:
        B = self.tc.batch_size
        last = 0.0
        for epoch in range(epochs):
            order = np.random.default_rng(epoch).permutation(len(data))
            for i in range(0, len(data) - B + 1, B):
                idx = order[i : i + B]
                self.g_params, self.g_opt, loss = self._pre_step(
                    self.g_params, self.g_opt, self._put_batch(data[idx]),
                    self._put_batch(self._meta_rows(meta, idx)), self.keys.next(),
                )
                last = float(loss)
        return last

    def gan_epoch(self, data: np.ndarray, meta: np.ndarray | None = None):
        B = self.tc.batch_size
        gl = dl = acc = 0.0
        order = np.random.default_rng(0).permutation(len(data))
        for i in range(0, len(data) - B + 1, B):
            idx = order[i : i + B]
            (self.g_params, self.d_params, self.g_opt, self.d_opt,
             g_loss, d_loss, d_acc) = self._gan_step(
                self.g_params, self.d_params, self.g_opt, self.d_opt,
                self._put_batch(data[idx]),
                self._put_batch(self._meta_rows(meta, idx)),
                self.keys.next(),
            )
            gl, dl, acc = float(g_loss), float(d_loss), float(d_acc)
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
