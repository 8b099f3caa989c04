"""Sequence-parallel halo exchange for causal convolutions.

The reference handles long sequences purely with dilation (receptive field
4094 over 44,093-sample training windows — wavenet/model.py:43-44,
faster_audio_data.py:29-34) on one device.  The TPU-native scale-out is to
shard the *time* axis across chips: each chip holds a contiguous chunk of the
window, and before a causal conv stack runs, every chip receives the last
``halo`` samples from its left neighbor (the receptive-field overlap).  This
is the conv analog of ring attention, expressed with ``jax.lax.ppermute`` so
XLA compiles it to a single neighbor ICI transfer (SURVEY.md §2.6, §5).

Usage inside ``shard_map`` over a mesh with a ``seq`` axis::

    x_local = left_halo_exchange(x_local, halo=receptive_field - 1, axis="seq")
    y_local = wavenet_forward(params, x_local)   # valid (no-pad) causal convs

With a left halo of ``receptive_field - 1`` samples prepended, a valid causal
conv stack produces exactly the local chunk's outputs, so concatenating the
chips' outputs equals the unsharded computation.  Chip 0 has no left
neighbor; its halo is zero-filled — matching the unsharded behavior when the
caller pre-pads (or the reference's "first receptive_field samples produce no
output" contract otherwise (wavenet/model.py:98-101)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def left_halo_exchange(
    x: jax.Array,
    halo: int,
    axis_name: str = "seq",
    time_axis: int = 1,
    first_shard_fill: jax.Array | None = None,
):
    """Prepend the left neighbor's trailing ``halo`` timesteps to ``x``.

    Must run inside ``shard_map``/``pmap`` with ``axis_name`` bound.  The
    first shard receives ``first_shard_fill`` (its real left context — e.g.
    the tail of a receptive-field margin buffer), or zeros if not given.

    Args:
      x: local chunk, time on ``time_axis``.
      halo: number of timesteps of left context needed
        (``receptive_field - 1`` for a causal conv stack).
      axis_name: mesh axis the sequence is sharded over.
      time_axis: which dim of ``x`` is time.
      first_shard_fill: ``[..., halo, ...]`` left context for shard 0.

    Returns:
      ``x`` with ``halo`` extra leading timesteps.
    """
    n = jax.lax.axis_size(axis_name)
    # trailing `halo` timesteps of the local chunk
    tail = jax.lax.slice_in_dim(x, x.shape[time_axis] - halo, x.shape[time_axis], axis=time_axis)
    if n == 1:
        recv = jnp.zeros_like(tail)
    else:
        # send right: shard i's tail -> shard i+1 (non-ring: shard 0 gets zeros)
        recv = jax.lax.ppermute(tail, axis_name, [(i, i + 1) for i in range(n - 1)])
    idx = jax.lax.axis_index(axis_name)
    fill = jnp.zeros_like(recv) if first_shard_fill is None else first_shard_fill
    recv = jnp.where(idx == 0, fill, recv)
    return jax.lax.concatenate([recv, x], dimension=time_axis)
