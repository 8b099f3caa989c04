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
    # G objective: "auto" = adversarial, switching to feature matching when
    # D saturates vs fake (the paper's escape hatch); "fm" = always feature
    # matching (the statistics-anchored objective — -log D(fake) alone lets
    # G drift off the corpus moments while still fooling D, measured in
    # benchmarks/crnngan_quality_run.py); "adv" = always adversarial
    g_objective: str = "auto"


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

        # model-axis (hidden-split) bi-LSTM discriminator: D params stored
        # gate-repacked + sharded (parallel/rnn_tp.py, parallel/gan_tp.py);
        # checkpoints always store the torch gate order (state()/restore)
        self.tp = mesh is not None and mesh.shape.get("model", 1) > 1
        self._tp_m = mesh.shape["model"] if self.tp else 1
        if self.tp:
            from jax.sharding import NamedSharding

            from music_tpu.parallel import gan_tp

            self._gan_tp = gan_tp
            d_specs = gan_tp.crnngan_d_specs()
            self.d_params = jax.tree_util.tree_map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                gan_tp.repack_crnngan_d(self.d_params, self._tp_m), d_specs,
            )
        else:
            self._gan_tp = None
            d_specs = P()
        self._d_specs = d_specs

        self.g_tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), optax.adam(tc.g_lr))
        # with tp the clip is applied manually (vma-aware; see below)
        # identity placeholder keeps the opt-state STRUCTURE identical to
        # the non-tp chain, so checkpoints swap between tp/non-tp trainers
        self.d_tx = (
            optax.chain(optax.identity(), optax.adam(tc.d_lr))
            if self.tp
            else optax.chain(optax.clip_by_global_norm(tc.grad_clip), optax.adam(tc.d_lr))
        )
        self.g_opt = self.g_tx.init(self.g_params)
        self.d_opt = self.d_tx.init(self.d_params)
        if self.tp:
            pdef = jax.tree_util.tree_structure(self.d_params)

            def _is_param_tree(x):
                return jax.tree_util.tree_structure(x) == pdef

            self._is_d_param_tree = _is_param_tree
            d_opt_specs = jax.tree_util.tree_map(
                lambda x: d_specs if _is_param_tree(x) else P(),
                self.d_opt, is_leaf=_is_param_tree,
            )
        else:
            self._is_d_param_tree = None
            d_opt_specs = P()

        if self.tp:
            gan_tp = self._gan_tp
            d_fwd = gan_tp.crnngan_forward_tp

            def _spec_has_model(sp):
                return any(
                    e == "model" or (isinstance(e, tuple) and "model" in e)
                    for e in sp
                )

            def clip_d_grads(grads):
                # vma-aware global-norm clip (see seqgan_train's rationale)
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
                scale = jnp.where(norm < tc.grad_clip, 1.0, tc.grad_clip / norm)
                return jax.tree_util.tree_map(lambda g: g * scale, grads)
        else:
            d_fwd = cg.discriminator_forward
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

        def gan_d_impl(g_params, d_params, d_opt, real, meta, key):
            """D half of the alternation: BCE step applied only while D
            isn't too strong (freezing rule).  The gate statistics are
            pmean'd so every shard selects identically; where-selection
            replaces lax.cond because the branches contain collectives
            (per-step model-axis psums under tp), which abort inside cond
            branches at run time."""
            key = localize(key)
            k1, _, _ = jax.random.split(key, 3)
            fake = cg.generate(g_params, k1, cfg, real.shape[0], meta=meta)
            p_real, _ = d_fwd(d_params, real, cfg, meta=meta)
            p_fake, _ = d_fwd(d_params, fake, cfg, meta=meta)
            d_acc = pmean(0.5 * (jnp.mean(p_real > 0.5) + jnp.mean(p_fake < 0.5)))
            mean_p_fake = pmean(jnp.mean(p_fake))

            dl, grads = jax.value_and_grad(
                lambda dp: cg.d_loss(dp, real, fake, cfg, d_forward=d_fwd, meta=meta)
            )(d_params)
            dl, grads = pmean((dl, grads))
            if clip_d_grads is not None:
                grads = clip_d_grads(grads)
            upd, opt_trained = self.d_tx.update(grads, d_opt)
            d_trained = optax.apply_updates(d_params, upd)
            do_train = d_acc < self.tc.d_too_strong
            sel = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(do_train, x, y), a, b
            )
            new_d, new_d_opt = sel(d_trained, d_params), sel(opt_trained, d_opt)
            return new_d, new_d_opt, dl, d_acc, mean_p_fake

        def gan_g_impl(g_params, d_params, g_opt, real, meta, key, mean_p_fake):
            """G half: adversarial or feature-matching loss, selected by
            the (replicated) D-saturation statistic from the D half."""
            key = localize(key)
            _, k2, k3 = jax.random.split(key, 3)
            use_fm = mean_p_fake < self.tc.feature_matching_below

            def g_loss(gp):
                fm = cg.g_feature_matching_loss(
                    gp, d_params, k2, real, cfg, meta=meta, axis_name=axis,
                    d_forward=d_fwd,
                )
                if self.tc.g_objective == "fm":
                    return fm
                adv = cg.g_adv_loss(
                    gp, d_params, k3, real.shape[0], cfg, meta=meta, d_forward=d_fwd
                )
                if self.tc.g_objective == "adv":
                    return adv
                return jnp.where(use_fm, fm, adv)

            gl, g_grads = jax.value_and_grad(g_loss)(g_params)
            gl, g_grads = pmean((gl, g_grads))
            upd, new_g_opt = self.g_tx.update(g_grads, g_opt)
            return optax.apply_updates(g_params, upd), new_g_opt, gl

        def gan_single_impl(g_params, d_params, g_opt, d_opt, real, meta, key):
            # non-tp path: one program, lax.cond gates (collective-free
            # branches) — the shape that is stable on XLA:CPU
            key = localize(key)
            k1, k2, k3 = jax.random.split(key, 3)
            fake = cg.generate(g_params, k1, cfg, real.shape[0], meta=meta)
            p_real, _ = d_fwd(d_params, real, cfg, meta=meta)
            p_fake, _ = d_fwd(d_params, fake, cfg, meta=meta)
            d_acc = pmean(0.5 * (jnp.mean(p_real > 0.5) + jnp.mean(p_fake < 0.5)))
            mean_p_fake = pmean(jnp.mean(p_fake))

            def train_d(_):
                loss, grads = jax.value_and_grad(
                    lambda dp: cg.d_loss(dp, real, fake, cfg, meta=meta)
                )(d_params)
                loss, grads = pmean((loss, grads))
                upd, new_opt = self.d_tx.update(grads, d_opt)
                return optax.apply_updates(d_params, upd), new_opt, loss

            def skip_d(_):
                return d_params, d_opt, pmean(
                    cg.d_loss(d_params, real, fake, cfg, meta=meta)
                )

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

            if self.tc.g_objective == "fm":
                g_loss = g_fm
            elif self.tc.g_objective == "adv":
                g_loss = g_adv
            else:
                def g_loss(gp):
                    return jax.lax.cond(use_fm, g_fm, g_adv, gp)

            gl, g_grads = jax.value_and_grad(g_loss)(g_params)
            gl, g_grads = pmean((gl, g_grads))
            upd, new_g_opt = self.g_tx.update(g_grads, g_opt)
            new_g = optax.apply_updates(g_params, upd)
            return new_g, new_d, new_g_opt, new_d_opt, gl, dl, d_acc

        @jax.jit
        def gan_single_step(g_params, d_params, g_opt, d_opt, real, meta, key):
            body = shardify(
                gan_single_impl,
                in_specs=(
                    P(), P(), P(), P(),
                    P("data", None, None), P("data", None), P(),
                ),
                out_specs=(P(), P(), P(), P(), P(), P(), P()),
            )
            return body(g_params, d_params, g_opt, d_opt, real, meta, key)

        # NOTE (tp): two separate programs rather than one — XLA:CPU's
        # collective rendezvous miscounts participants when the D-grad and
        # G-grad model-axis all-reduces share one executable (crashes the
        # process); two executables also cost nothing on TPU
        @jax.jit
        def gan_d_step(g_params, d_params, d_opt, real, meta, key):
            body = shardify(
                gan_d_impl,
                in_specs=(
                    P(), d_specs, d_opt_specs,
                    P("data", None, None), P("data", None), P(),
                ),
                out_specs=(d_specs, d_opt_specs, P(), P(), P()),
            )
            return body(g_params, d_params, d_opt, real, meta, key)

        @jax.jit
        def gan_g_step(g_params, d_params, g_opt, real, meta, key, mean_p_fake):
            body = shardify(
                gan_g_impl,
                in_specs=(
                    P(), d_specs, P(),
                    P("data", None, None), P("data", None), P(), P(),
                ),
                out_specs=(P(), P(), P()),
            )
            return body(g_params, d_params, g_opt, real, meta, key, mean_p_fake)

        self._pre_step = pre_step
        self._gan_single_step = gan_single_step
        self._gan_d_step = gan_d_step
        self._gan_g_step = gan_g_step


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
            real_b = self._put_batch(data[idx])
            meta_b = self._put_batch(self._meta_rows(meta, idx))
            key_b = self.keys.next()
            if not self.tp:
                (self.g_params, self.d_params, self.g_opt, self.d_opt,
                 g_loss, d_loss, d_acc) = self._gan_single_step(
                    self.g_params, self.d_params, self.g_opt, self.d_opt,
                    real_b, meta_b, key_b,
                )
            else:
                self.d_params, self.d_opt, d_loss, d_acc, mpf = self._gan_d_step(
                    self.g_params, self.d_params, self.d_opt,
                    real_b, meta_b, key_b,
                )
                # drain program 1's collectives before program 2 launches
                # its own (XLA:CPU rendezvous fragility); free on TPU
                self.d_params = jax.block_until_ready(self.d_params)
                self.g_params, self.g_opt, g_loss = self._gan_g_step(
                    self.g_params, self.d_params, self.g_opt, real_b, meta_b,
                    key_b, mpf,
                )
                self.g_params = jax.block_until_ready(self.g_params)
            gl, dl, acc = float(g_loss), float(d_loss), float(d_acc)
        return gl, dl, acc

    def _map_d_layout(self, tree, fn):
        # apply fn to the param tree itself or to every param-shaped
        # subtree of an optimizer state (adam's mu/nu)
        if not self.tp:
            return tree
        if self._is_d_param_tree(tree):
            return fn(tree, self._tp_m)
        return jax.tree_util.tree_map(
            lambda x: fn(x, self._tp_m) if self._is_d_param_tree(x) else x,
            tree, is_leaf=self._is_d_param_tree,
        )

    def state(self):
        # checkpoints always store the torch gate order, independent of tp
        unpack = self._gan_tp.unpack_crnngan_d if self.tp else None
        return {
            "g_params": self.g_params,
            "d_params": self._map_d_layout(self.d_params, unpack),
            "g_opt": self.g_opt,
            "d_opt": self._map_d_layout(self.d_opt, unpack),
        }

    def save(self, ckpt_dir: str | Path, step: int):
        ckpt_lib.save(ckpt_dir, step, self.state())

    def restore(self, ckpt_dir: str | Path) -> int:
        state, step = ckpt_lib.restore_or_init(ckpt_dir, self.state())
        repack = self._gan_tp.repack_crnngan_d if self.tp else None
        self.g_params = state["g_params"]
        self.d_params = self._map_d_layout(state["d_params"], repack)
        self.g_opt = state["g_opt"]
        self.d_opt = self._map_d_layout(state["d_opt"], repack)
        return step
