"""WaveNet training-step throughput on the reference's training shape:
batch 4 x [receptive_field + 40000] windows (wavenet/params/*.json), full
40-block model, one chip.

Prints one JSON line {metric, value, unit}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


def run(n_iters: int = 5) -> dict:
    from music_tpu.models import wavenet as wn
    from music_tpu.parallel.mesh import MeshSpec, make_mesh
    from music_tpu.train import wavenet_train as wt

    cfg = wn.WaveNetConfig()
    WL = 40000
    B = 4
    mesh = make_mesh(MeshSpec(data=-1))
    tx = optax.adam(1e-4)
    state = wt.init_state(jax.random.PRNGKey(0), cfg, tx, mesh)
    step_fn, _ = wt.make_train_step(cfg, tx, mesh, WL)

    def batch(seed):
        return jax.device_put(
            np.random.default_rng(seed).integers(
                0, 256, (B, cfg.receptive_field + WL), dtype=np.int32
            ),
            NamedSharding(mesh, P("data", None)),
        )

    # warm: first TWO calls can pay compile/layout costs on relayed backends
    for i in range(2):
        state, loss = step_fn(state, batch(i))
        float(loss)
    times = []
    for i in range(2, 2 + n_iters):
        t0 = time.perf_counter()
        state, loss = step_fn(state, batch(i))
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "metric": "wavenet_train_step_throughput",
        "value": round(B * WL / dt, 1),
        "unit": "samples/sec/chip",
        "step_ms": round(dt * 1000, 1),
    }


if __name__ == "__main__":
    print(json.dumps(run()))
