"""Device-mesh construction, sharding rules, and sequence-parallel halo exchange."""

from music_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
