"""C-RNN-GAN generation: sample the generator, denormalize, write MIDI.

The reference's generate.py is an empty file (SURVEY.md §2.4); this is the
intended capability: G samples [T, 4] event tensors -> inverse feature
scaling -> events_to_midi (music_tpu/data/midi.py) -> .mid on disk.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from music_tpu.data.midi import events_to_midi
from music_tpu.models import crnngan as cg


def generate(
    g_params: dict,
    cfg: cg.CRnnGanConfig,
    out_path: str | Path,
    *,
    scaler=None,
    length: int | None = None,
    seed: int = 0,
    ticks_per_quarter_note: int = 384,
    meta=None,
) -> np.ndarray:
    """Generate one song and write it as a MIDI file; returns the raw
    [T, 4] event array (delta_tick, length, freq, velocity).

    ``meta``: optional [meta_dim] genre/composer one-hot row conditioning
    the generator (cfg.meta_dim > 0)."""
    if meta is not None:
        meta = jax.numpy.asarray(meta, jax.numpy.float32).reshape(1, -1)
    events = np.asarray(
        cg.generate(
            g_params, jax.random.PRNGKey(seed), cfg, batch=1, length=length,
            meta=meta,
        )
    )[0]
    if scaler is not None:
        events = scaler.inverse(events)
    # clamp to physical ranges
    events[:, 0] = np.maximum(events[:, 0], 0.0)     # delta ticks
    events[:, 1] = np.maximum(events[:, 1], 1.0)     # length
    events[:, 2] = np.clip(events[:, 2], 8.18, 12543.85)  # MIDI 0..127 in Hz
    events[:, 3] = np.clip(events[:, 3], 1, 127)     # velocity
    events_to_midi(events, out_path, ticks_per_quarter_note)
    return events
