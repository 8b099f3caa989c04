"""WaveNet-autoencoder training: jitted train step + public train() loop.

Parity surface: wavenet_autoencoder/train.py (a copy of wavenet's loop with
an added lbfgs option :33-34 and the same rotating checkpoints :147-160).
The reference subproject is missing its dataset module and two param files
(train.py:7,21-23 — SURVEY.md §5); this entry point wires the shared
pipeline (music_tpu.data.audio) instead, which is the intended behavior.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from music_tpu.core import checkpoint as ckpt_lib
from music_tpu.core.metrics import Meter, MetricsLogger, Throughput
from music_tpu.core.optim import from_config as optimizer_from_config
from music_tpu.core.prng import KeySeq
from music_tpu.data.audio import AudioWindows
from music_tpu.models import wavenet_ae as ae
from music_tpu.train.wavenet_train import TrainState


def make_train_step(cfg: ae.WaveNetAEConfig, tx: optax.GradientTransformation):
    @jax.jit
    def train_step(state: TrainState, tokens: jax.Array):
        loss, grads = jax.value_and_grad(ae.loss_fn)(state.params, tokens, cfg)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def train(
    *,
    model_params: Mapping[str, Any],
    dataset_params: Mapping[str, Any],
    train_params: Mapping[str, Any],
    mesh: Mesh | None = None,
) -> TrainState:
    """Public train() (wavenet_autoencoder/train.py:66-167 surface)."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    cfg = ae.WaveNetAEConfig.from_json(dict(model_params))
    mesh = mesh or make_mesh(MeshSpec(data=-1))
    tx = optimizer_from_config(train_params)
    keys = KeySeq(train_params.get("seed", 0))

    windows = AudioWindows.from_pickle(
        dataset_params["audio_path"],
        receptive_field=cfg.receptive_field,
        window_length=dataset_params["window_length"],
    )
    logger = MetricsLogger(train_params.get("log_dir", "logs/wavenet_ae"))
    ckpt_dir = train_params.get("restore_dir", "checkpoints/wavenet_ae")

    params = ae.init_params(keys.next(), cfg)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, start_step = ckpt_lib.restore_or_init(ckpt_dir, state)

    train_step = make_train_step(cfg, tx)
    sharding = NamedSharding(mesh, P("data", None))

    meter, thru = Meter(), Throughput()
    print_every = train_params.get("print_every", 100)
    step = start_step
    for epoch in range(train_params.get("num_epochs", 1)):
        for batch in windows.batches(
            dataset_params["batch_size"], seed=train_params.get("seed", 0) + epoch
        ):
            tokens = jax.device_put(batch, sharding)
            state, loss = train_step(state, tokens)
            step += 1
            meter.update(float(loss))
            thru.update(batch.shape[0])
            if step % print_every == 0:
                logger.log_loss(epoch, step, meter.mean, pieces_per_sec=round(thru.rate, 2))
                meter.reset()
        ckpt_lib.save(
            ckpt_dir, step, state,
            max_checkpoints=train_params.get("max_check_points", 10),
        )
        logger.log_event(f"saved checkpoint at step {step}")
    return state
