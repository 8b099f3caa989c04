"""SeqGAN training orchestration: oracle protocol, MLE pretrain, adversarial
alternation — the public surface of SeqGan_Pytorch/train.py + seqgan.py.

Reference flow (SeqGan_Pytorch/train.py:62-97): a randomly-initialized
G_LSTM acts as the oracle ("real" distribution) and writes positive samples;
pretrain G by MLE; pretrain D on pos/neg files; then alternate: G policy-
gradient step with MC-rollout rewards / regenerate negatives / D steps.
Oracle NLL (leak_gan/target.py:104-113 protocol) is the quality metric.

TPU redesign: each phase step is one jitted program; the file artifacts
(whitespace-separated token lines, generator.py:90-106 format) remain as an
API but never sit on the hot path.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from music_tpu.core.prng import KeySeq
from music_tpu.models import seqgan as sg


@dataclasses.dataclass
class SeqGanConfig:
    """Hyperparameters of SeqGan_Pytorch/train.py:22-58."""

    g: sg.GeneratorConfig = dataclasses.field(default_factory=sg.GeneratorConfig)
    d: sg.DiscriminatorConfig = dataclasses.field(default_factory=sg.DiscriminatorConfig)
    batch_size: int = 64
    generated_num: int = 1024     # sequences the oracle/generator materializes
    rollout_num: int = 16
    g_lr: float = 1e-2
    d_lr: float = 1e-2
    grad_clip: float = 5.0        # seqgan.py:35
    # "normal" = N(0,1) everywhere, the SeqGAN-paper synthetic-oracle init
    # (leak_gan/target.py:30-32); the reference's own train.py:61 used
    # module defaults, whose near-uniform oracle pins NLL at ln(V) (div.)
    oracle_init: str = "normal"


def write_samples(path: str | Path, samples: np.ndarray):
    """Whitespace-separated token lines (generator.py:90-106 artifact)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w") as f:
        for row in np.asarray(samples):
            f.write(" ".join(str(int(v)) for v in row) + "\n")


def read_samples(path: str | Path) -> np.ndarray:
    rows = []
    for line in Path(path).read_text().splitlines():
        if line.strip():
            rows.append([int(v) for v in line.split()])
    return np.asarray(rows, np.int32)


class SeqGanTrainer:
    """Holds G/D/oracle params + optimizers; each phase is a jitted step.

    With ``mesh`` (a ``data``-axis Mesh), every fused phase runs under
    shard_map: the positive corpus and generated batches shard over
    ``data``, per-shard PRNG streams diverge via axis-index folding, and
    gradients all-reduce (pmean) before each optimizer update — effective
    batch = batch_size x data_parallelism, replicated params throughout.
    """

    def __init__(self, cfg: SeqGanConfig, seed: int = 0, mesh: Mesh | None = None):
        self.cfg = cfg
        self.mesh = mesh
        axis = "data" if mesh is not None and mesh.shape.get("data", 1) > 1 else None
        self.axis = axis

        def pmean(tree):
            return jax.lax.pmean(tree, axis) if axis else tree

        def localize(key):
            return (
                jax.random.fold_in(key, jax.lax.axis_index(axis)) if axis else key
            )

        def shardify(body, in_specs, out_specs):
            if mesh is None or (axis is None and not (
                mesh.shape.get("model", 1) > 1
            )):
                return body
            return shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

        self.keys = KeySeq(seed)
        # oracle = randomly-initialized generator; oracle_init="normal"
        # gives the target-LSTM N(0,1) init (leak_gan/target.py:30-32 /
        # the SeqGAN paper's synthetic oracle) so oracle NLL has range to
        # register quality; "torch" reproduces the reference's train.py:61
        # module-default oracle (NLL pinned near ln V)
        self.oracle_params = sg.init_generator(
            self.keys.next(), cfg.g, init=cfg.oracle_init
        )
        self.g_params = sg.init_generator(self.keys.next(), cfg.g)
        self.d_params = sg.init_discriminator(self.keys.next(), cfg.d)

        # model-axis split of the 1720-filter discriminator
        # (parallel/gan_tp.py): D params/opt shard over ``model``; the D
        # phases and rollout scoring run the TP forward
        self.tp = mesh is not None and mesh.shape.get("model", 1) > 1
        if self.tp:
            from music_tpu.parallel import gan_tp

            d_specs = gan_tp.discriminator_specs(cfg.d)
            self.d_params = jax.tree_util.tree_map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                self.d_params, d_specs,
            )
        else:
            gan_tp = None
            d_specs = P()

        self.g_tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip), optax.adam(cfg.g_lr)
        )
        # with tp, the global-norm clip is applied manually (vma-aware —
        # see clip_d_grads below); the chained optax clip would compute a
        # per-shard norm over the model-sharded leaves
        # identity placeholder keeps the opt-state structure identical to
        # the non-tp chain (checkpoint compatibility across trainer modes)
        self.d_tx = (
            optax.chain(optax.identity(), optax.adam(cfg.d_lr))
            if self.tp
            else optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip), optax.adam(cfg.d_lr)
            )
        )
        self.g_opt = self.g_tx.init(self.g_params)
        self.d_opt = self.d_tx.init(self.d_params)
        if self.tp:
            # optimizer moments mirror the param tree exactly: substitute
            # the param specs for every param-shaped subtree of the state
            # (adam's mu/nu), replicate everything else (count, clip state)
            pdef = jax.tree_util.tree_structure(self.d_params)

            def _is_param_tree(x):
                return jax.tree_util.tree_structure(x) == pdef

            d_opt_specs = jax.tree_util.tree_map(
                lambda x: d_specs if _is_param_tree(x) else P(),
                self.d_opt, is_leaf=_is_param_tree,
            )
        else:
            d_opt_specs = P()

        g_cfg, d_cfg = cfg.g, cfg.d

        if self.tp:
            def d_loss_fn(p, toks, labs, k):
                return gan_tp.seqgan_dis_loss_tp(p, toks, labs, d_cfg, k)

            def d_pos_prob(p, toks):
                out = gan_tp.discriminator_forward_tp(p, toks, d_cfg)
                return jax.nn.softmax(out["score"], axis=-1)[:, 1]

            def _spec_has_model(sp):
                return any(
                    e == "model" or (isinstance(e, tuple) and "model" in e)
                    for e in sp
                )

            def clip_d_grads(grads):
                """clip_by_global_norm with model-sharded leaves: the norm
                must sum squared grads over the FULL tensors (psum the
                sharded leaves' contributions over ``model``) and the
                resulting scale is then replication-safe — optax's chained
                clip would compute a per-shard norm and make replicated
                leaves model-varying, breaking both semantics and the scan
                carry types.  (Grads themselves need no manual psum: the
                shard_map transpose already completes replicated-leaf
                cotangents.)"""
                sq = 0.0
                for g, sp in zip(
                    jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(
                        d_specs, is_leaf=lambda x: isinstance(x, P)
                    ),
                ):
                    ss = jnp.sum(jnp.square(g))
                    sq = sq + (jax.lax.psum(ss, "model") if _spec_has_model(sp) else ss)
                norm = jnp.sqrt(sq)
                scale = jnp.where(norm < cfg.grad_clip, 1.0, cfg.grad_clip / norm)
                return jax.tree_util.tree_map(lambda g: g * scale, grads)
        else:
            def d_loss_fn(p, toks, labs, k):
                return sg.discriminator_loss(p, toks, labs, d_cfg, k)

            d_pos_prob = None
            clip_d_grads = None

        @jax.jit
        def mle_step(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(sg.generator_nll)(params, tokens, g_cfg)
            loss, grads = pmean((loss, grads))
            updates, opt_state = self.g_tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        def mle_phase_impl(params, opt_state, positive, key, *, epochs):
            """MLE pretraining epochs fused on-device (shuffle + minibatch
            scan), mirroring d_phase."""
            key = localize(key)
            N, T = positive.shape
            B = cfg.batch_size
            n_batches = N // B

            def one_batch(carry, tokens_b):
                params, opt_state = carry
                (params, opt_state, loss) = mle_step(params, opt_state, tokens_b)
                return (params, opt_state), loss

            def one_epoch(carry, key_e):
                params, opt_state = carry
                perm = jax.random.permutation(key_e, N)[: n_batches * B]
                batches = positive[perm].reshape(n_batches, B, T)
                (params, opt_state), losses = jax.lax.scan(
                    one_batch, (params, opt_state), batches
                )
                return (params, opt_state), losses[-1]

            (params, opt_state), losses = jax.lax.scan(
                one_epoch, (params, opt_state), jax.random.split(key, epochs)
            )
            return params, opt_state, losses[-1]

        @functools.partial(jax.jit, static_argnames=("epochs",))
        def mle_phase(params, opt_state, positive, key, *, epochs):
            body = shardify(
                functools.partial(mle_phase_impl, epochs=epochs),
                in_specs=(P(), P(), P("data", None), P()),
                out_specs=(P(), P(), P()),
            )
            return body(params, opt_state, positive, key)

        def pg_step_impl(g_params, opt_state, d_params, key):
            k1, k2 = jax.random.split(localize(key))
            samples = sg.generate(g_params, k1, g_cfg, cfg.batch_size)
            rewards = sg.rollout_rewards(
                g_params, d_params, samples, k2,
                g_cfg=g_cfg, d_cfg=d_cfg, rollout_num=cfg.rollout_num,
                pos_prob_fn=d_pos_prob,
            )
            loss, grads = jax.value_and_grad(sg.pg_loss)(
                g_params, samples, rewards, g_cfg
            )
            loss, grads = pmean((loss, grads))
            updates, opt_state = self.g_tx.update(grads, opt_state)
            return optax.apply_updates(g_params, updates), opt_state, loss, rewards

        @jax.jit
        def pg_step(g_params, opt_state, d_params, key):
            body = shardify(
                pg_step_impl,
                in_specs=(P(), P(), d_specs, P()),
                out_specs=(P(), P(), P(), P("data", None)),
            )
            return body(g_params, opt_state, d_params, key)

        @jax.jit
        def oracle_nll(oracle_params, g_params, key):
            samples = sg.generate(g_params, key, g_cfg, cfg.batch_size)
            return sg.generator_nll(oracle_params, samples, g_cfg)

        def d_phase_impl(d_params, d_opt, g_params, positive, key, *, d_steps, d_epochs):
            """The WHOLE discriminator-retraining phase as one program:
            d_steps x (regenerate negatives -> d_epochs x shuffled minibatch
            CE epochs) — the reference's seqgan.py:83-93 loop without ~500
            host round-trips.  Shuffling, minibatching, and optimizer
            updates all run on-device via nested lax.scan."""
            key = localize(key)
            N, T = positive.shape
            B = cfg.batch_size
            n_batches = (2 * N) // B

            def one_batch(carry, inp):
                d_params, d_opt = carry
                tokens_b, labels_b, key_b = inp
                loss, grads = jax.value_and_grad(d_loss_fn)(
                    d_params, tokens_b, labels_b, key_b
                )
                loss, grads = pmean((loss, grads))
                if clip_d_grads is not None:
                    grads = clip_d_grads(grads)
                updates, d_opt = self.d_tx.update(grads, d_opt)
                return (optax.apply_updates(d_params, updates), d_opt), loss

            def one_epoch(carry, key_e):
                d_params, d_opt, tokens, labels = carry
                k_perm, k_drop = jax.random.split(key_e)
                perm = jax.random.permutation(k_perm, 2 * N)[: n_batches * B]
                toks = tokens[perm].reshape(n_batches, B, T)
                labs = labels[perm].reshape(n_batches, B)
                keys_b = jax.random.split(k_drop, n_batches)
                (d_params, d_opt), losses = jax.lax.scan(
                    one_batch, (d_params, d_opt), (toks, labs, keys_b)
                )
                return (d_params, d_opt, tokens, labels), losses[-1]

            def one_step(carry, key_s):
                d_params, d_opt = carry
                k_gen, k_epochs = jax.random.split(key_s)
                negative = sg.generate(g_params, k_gen, g_cfg, N)
                tokens = jnp.concatenate([positive, negative])
                labels = jnp.concatenate(
                    [jnp.ones((N,), jnp.int32), jnp.zeros((N,), jnp.int32)]
                )
                (d_params, d_opt, _, _), losses = jax.lax.scan(
                    one_epoch,
                    (d_params, d_opt, tokens, labels),
                    jax.random.split(k_epochs, d_epochs),
                )
                return (d_params, d_opt), losses[-1]

            (d_params, d_opt), losses = jax.lax.scan(
                one_step, (d_params, d_opt), jax.random.split(key, d_steps)
            )
            return d_params, d_opt, losses[-1]

        @functools.partial(jax.jit, static_argnames=("d_steps", "d_epochs"))
        def d_phase(d_params, d_opt, g_params, positive, key, *, d_steps, d_epochs):
            body = shardify(
                functools.partial(d_phase_impl, d_steps=d_steps, d_epochs=d_epochs),
                in_specs=(d_specs, d_opt_specs, P(), P("data", None), P()),
                out_specs=(d_specs, d_opt_specs, P()),
            )
            return body(d_params, d_opt, g_params, positive, key)

        self._mle_step = mle_step
        self._mle_phase = mle_phase
        self._pg_step = pg_step
        self._oracle_nll = oracle_nll
        self._d_phase = d_phase

    # ----- phases ---------------------------------------------------------

    def _put_batch(self, arr):
        """Device-put with data-axis sharding; under multi-process each
        host contributes only its own rows (parallel/multihost.py)."""
        if self.mesh is not None:
            from music_tpu.parallel import multihost

            return multihost.put_global_batch(self.mesh, np.asarray(arr))
        return jnp.asarray(arr)

    def oracle_samples(self, n: int) -> np.ndarray:
        """Positive data from the oracle (train.py:62-64)."""
        out = []
        for _ in range(-(-n // self.cfg.batch_size)):
            out.append(
                np.asarray(
                    sg.generate(self.oracle_params, self.keys.next(), self.cfg.g, self.cfg.batch_size)
                )
            )
        return np.concatenate(out)[:n]

    def generator_samples(self, n: int) -> np.ndarray:
        out = []
        for _ in range(-(-n // self.cfg.batch_size)):
            out.append(
                np.asarray(
                    sg.generate(self.g_params, self.keys.next(), self.cfg.g, self.cfg.batch_size)
                )
            )
        return np.concatenate(out)[:n]

    def pretrain_generator(self, positive: np.ndarray, epochs: int = 1) -> float:
        """MLE pretraining (seqgan.py:78-81) — fused epochs on-device."""
        n = (len(positive) // self.cfg.batch_size) * self.cfg.batch_size
        if n == 0:
            raise ValueError("positive data smaller than one batch")
        self.g_params, self.g_opt, loss = self._mle_phase(
            self.g_params, self.g_opt,
            self._put_batch(np.asarray(positive[:n], np.int32)),
            self.keys.next(), epochs=epochs,
        )
        return float(loss)

    def train_discriminator(
        self, positive: np.ndarray, d_steps: int = 1, epochs: int = 1
    ) -> float:
        """Regenerate negatives, then CE epochs (seqgan.py:83-93) — the
        whole phase is ONE device program (see d_phase)."""
        self.d_params, self.d_opt, loss = self._d_phase(
            self.d_params, self.d_opt, self.g_params,
            self._put_batch(np.asarray(positive, np.int32)), self.keys.next(),
            d_steps=d_steps, d_epochs=epochs,
        )
        return float(loss)

    def adversarial_epoch(self, positive: np.ndarray, g_steps: int = 1, d_steps: int = 5, d_epochs: int = 3):
        """One adversarial round (seqgan.py:160-168): g_steps PG updates with
        fresh MC rewards, then D retraining."""
        g_loss = 0.0
        for _ in range(g_steps):
            self.g_params, self.g_opt, loss, _ = self._pg_step(
                self.g_params, self.g_opt, self.d_params, self.keys.next()
            )
            g_loss = float(loss)
        d_loss = self.train_discriminator(positive, d_steps, d_epochs)
        return g_loss, d_loss

    def oracle_nll(self) -> float:
        """Quality metric: NLL of G's samples under the oracle."""
        return float(self._oracle_nll(self.oracle_params, self.g_params, self.keys.next()))
