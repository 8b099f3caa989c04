"""music_tpu — a TPU-native (JAX / XLA / Pallas / pjit) music-generation framework.

A from-scratch rebuild of the capabilities of the deep-art-project/Music suite
(five PyTorch subprojects: wavenet, SeqGan_Pytorch, leak_gan, c-rnn-gan,
wavenet_autoencoder) as one unified, TPU-first framework:

- ``music_tpu.core``     — config, checkpointing, metrics, optimizers, PRNG.
- ``music_tpu.ops``      — jitted audio/codec/conv/sampling primitives.
- ``music_tpu.kernels``  — Pallas TPU kernels for the hot paths.
- ``music_tpu.models``   — the five model families, re-designed around
  ``lax.scan`` / ``jax.vmap`` / ``pjit`` instead of Python loops.
- ``music_tpu.parallel`` — device-mesh construction, sharding rules,
  sequence-parallel halo exchange.
- ``music_tpu.data``     — host-side dataset pipelines (audio windows, token
  corpora, MIDI events) feeding device-resident batches.
- ``music_tpu.train`` / ``music_tpu.generate`` — per-workload entry points
  mirroring the reference's public train()/generate() surfaces.

Design stance (see SURVEY.md §7): one shared core instead of five silos; all
hot loops live on-device inside single compiled programs; parallelism is
expressed with ``jax.sharding`` over a Mesh, not replicated-module wrappers.
"""

__version__ = "0.1.0"

from music_tpu.core import config  # noqa: F401
