"""Multi-host (multi-process) distribution.

The TPU-native replacement for scaling past one host: the reference's only
multi-device mechanism is single-process ``nn.DataParallel`` over explicit
GPU ids (wavenet/train.py:116-122, SURVEY.md §2.6); here each process joins
a ``jax.distributed`` cluster, contributes its local chips to one global
``Mesh``, and feeds only its own rows of every batch — XLA collectives ride
ICI within a slice and DCN across hosts, with no user-visible transport
code.

Usage (same code path single- or multi-host):

    multihost.initialize(coordinator, num_processes, process_id)  # no-op
    mesh = make_mesh(MeshSpec(data=-1))          # over GLOBAL devices
    tokens = multihost.put_global_batch(mesh, batch)  # per-host rows only
    state, loss = train_step(state, tokens)      # grads all-reduce DCN+ICI

On TPU pods all three ``initialize`` arguments default from the runtime
environment; CPU multi-process runs (the test path) pass them explicitly
and get the gloo collectives backend.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join (or create) the jax.distributed cluster.  Idempotent: safe to
    call when already initialized or when running single-process with no
    coordinator configured.  Must run before anything touches the XLA
    backend (don't even call jax.devices()/process_count() first)."""
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:  # older jax: fall through, initialize will raise
        pass
    if coordinator is None and num_processes is None and process_id is None:
        # TPU pod case: everything auto-detected from the environment; on a
        # plain single host this raises and we stay single-process.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    try:
        # CPU multi-process (tests / local clusters) needs a cross-process
        # collectives implementation; gloo ships with jaxlib.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(n: int) -> slice:
    """This process's contiguous slice of ``n`` global batch rows.
    ``n`` must divide evenly by the process count (the reference imposed
    the same constraint on DataParallel batches, wavenet/train.py:120)."""
    p, pid = jax.process_count(), jax.process_index()
    if n % p != 0:
        raise ValueError(f"global batch {n} not divisible by {p} processes")
    per = n // p
    return slice(pid * per, (pid + 1) * per)


def put_global_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Device-put a GLOBAL batch with leading-dim ``data`` sharding.

    Single-process: a plain sharded device_put.  Multi-process: each host
    transfers only its :func:`host_shard` rows and JAX assembles the global
    array view (``jax.make_array_from_process_local_data`` — the TPU-native
    replacement for DataLoader worker scatter, SURVEY.md §2.6)."""
    sharding = NamedSharding(mesh, P("data", *([None] * (batch.ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    local = np.ascontiguousarray(batch[host_shard(batch.shape[0])])
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape=batch.shape
    )


def fetch_scalar(x: jax.Array) -> float:
    """Read a (possibly cross-host) scalar to Python — all processes hold
    fully-replicated outputs for P() out_shardings, so this is local."""
    return float(jax.device_get(jax.jit(lambda v: v)(x)))
