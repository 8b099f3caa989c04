"""Device mesh setup and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel`` over
explicit GPU ids (wavenet/train.py:116-122, wavenet_autoencoder/train.py:84-88)
— replicate module, scatter batch, gather outputs.  The TPU-native equivalent
is a ``jax.sharding.Mesh`` with named axes and sharding annotations compiled
into XLA collectives over ICI (SURVEY.md §2.6):

- ``data``  axis — batch sharding (DP): gradients all-reduce over ICI.
- ``seq``   axis — sequence sharding (the conv analog of context parallelism):
  long audio windows split across chips with receptive-field halo exchange
  (see :mod:`music_tpu.parallel.halo`).
- ``model`` axis — optional channel sharding for the 512-wide skip pathway.

All helpers degrade gracefully to a single device (axis size 1).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. Axis size -1 means 'all remaining devices'."""

    data: int = -1
    seq: int = 1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        sizes = [self.data, self.seq, self.model]
        free = [i for i, s in enumerate(sizes) if s == -1]
        fixed = int(np.prod([s for s in sizes if s != -1]))
        if n_devices % fixed != 0:
            raise ValueError(f"{n_devices} devices not divisible by fixed axes {sizes}")
        if len(free) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if free:
            sizes[free[0]] = n_devices // fixed
        if int(np.prod(sizes)) != n_devices:
            raise ValueError(f"mesh {sizes} != {n_devices} devices")
        return tuple(sizes)


AXES = ("data", "seq", "model")


def make_mesh(spec: MeshSpec | None = None, devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Create a 3-axis ``(data, seq, model)`` mesh over the available devices.

    Devices are laid out so that the fastest-varying axis (``model``, then
    ``seq``) maps to nearest ICI neighbors in the default device order.
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    shape = spec.resolve(len(devices))
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def batch_seq_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim0 over ``data`` and dim1 (time) over ``seq``."""
    assert ndim >= 2
    return NamedSharding(mesh, P("data", "seq", *([None] * (ndim - 2))))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with batch-dim sharding over ``data``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def shard_params(mesh: Mesh, params):
    """Replicate a parameter pytree across the mesh (models here are <5M
    params — SURVEY.md §2.6 — so replication + DP is the right default;
    channel sharding over ``model`` is opt-in per-model)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), params
    )
