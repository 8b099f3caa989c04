"""Profiling / timing utilities.

The reference's only profiler is a hand-rolled fwd/bwd/opt wall-clock
fraction printer in its 2-GPU smoke test (wavenet/test.py:44-69).  This
module supplies the TPU-native equivalents:

- ``phase_fractions``: the same fwd/bwd/opt breakdown, measured honestly on
  an async backend (block-until-ready between phases).
- ``trace``: a context manager around ``jax.profiler`` for real XLA traces
  (TensorBoard-viewable), with annotation helper.
- ``time_fn``: robust wall-clock timing for jitted callables on relayed
  backends (fresh inputs per call + host fetch — see
  .claude/skills/verify/SKILL.md for why).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


def phase_fractions(
    loss_fn: Callable,
    params,
    batch,
    tx,
    opt_state,
    n_iters: int = 10,
) -> dict[str, float]:
    """Forward / backward / optimizer wall-clock fractions — the
    wavenet/test.py:44-69 breakdown for a JAX step.  Phases are compiled
    separately (in production they fuse into one program; this is a
    diagnostic view)."""
    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))

    def opt_step(grads, opt_state, params):
        updates, new_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), new_state

    opt = jax.jit(opt_step)

    # warmup / compile
    jax.block_until_ready(fwd(params, batch))
    grads = jax.block_until_ready(grad(params, batch))
    jax.block_until_ready(opt(grads, opt_state, params))

    t_fwd = t_bwd = t_opt = 0.0
    for _ in range(n_iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, batch))
        t1 = time.perf_counter()
        grads = jax.block_until_ready(grad(params, batch))
        t2 = time.perf_counter()
        jax.block_until_ready(opt(grads, opt_state, params))
        t3 = time.perf_counter()
        t_fwd += t1 - t0
        t_bwd += t2 - t1
        t_opt += t3 - t2
    total = t_fwd + t_bwd + t_opt
    return {
        "forward_frac": t_fwd / total,
        "backward_frac": t_bwd / total,
        "optimizer_frac": t_opt / total,
        "total_seconds": total / n_iters,
    }


def time_fn(fn: Callable, make_args: Callable[[int], tuple], n: int = 3) -> float:
    """Median wall-clock of ``fn(*make_args(i))`` with fresh inputs per call
    and a host fetch, safe against relay result caches and dispatch-ack
    returns."""
    fn(*make_args(0))  # compile
    times = []
    for i in range(1, n + 1):
        args = make_args(i)
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
