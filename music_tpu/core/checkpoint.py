"""Checkpoint / resume subsystem.

The reference has three coexisting checkpoint designs (SURVEY.md §5):
(a) wavenet: bare state_dict with the epoch encoded in the filename and
    rotation that deletes the oldest beyond ``max_check_points``
    (wavenet/train.py:45-50,198-216);
(b) leak_gan: a monolithic dict of model+optimizer+scheduler state for full
    training-state resume (leak_gan/train.py:323-337) — with a rotation typo
    that saves ``cpkt*`` but deletes ``ckpt*``;
(c) SeqGAN / c-rnn-gan: stubs.

This module is the single unified replacement: whole-training-state pytree
checkpoints (params + optimizer state + step + PRNG key + anything else the
caller packs), step-encoded directory names, atomic writes, and rotation.

Format: one ``.npz`` of flattened leaves keyed by pytree key-path, plus a
JSON manifest describing structure and dtypes.  No pickle — checkpoints are
portable and inspectable.  Device arrays are fetched to host on save;
``restore`` returns numpy leaves which JAX consumes (and re-shards) on first
use, so restore composes with any Mesh layout.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np

_MANIFEST = "manifest.json"
_ARRAYS = "arrays.npz"
_STEP_RE = re.compile(r"^step_(\d+)$")


def _keystr(path) -> str:
    return jax.tree_util.keystr(path)


def save(
    ckpt_dir: str | Path,
    step: int,
    state: Any,
    *,
    max_checkpoints: int | None = 10,
) -> Path:
    """Save ``state`` (any pytree of arrays / scalars) as ``step_<N>``.

    Writes atomically (tmp dir + rename), then rotates old checkpoints down
    to ``max_checkpoints`` — the wavenet rotation behavior
    (wavenet/train.py:198-216) without the leak_gan cpkt/ckpt typo.

    Multi-host: call on EVERY process (host-sharded leaves are gathered
    with a collective); only process 0 touches the filesystem.
    """
    is_main = jax.process_index() == 0
    ckpt_dir = Path(ckpt_dir)
    target = ckpt_dir / f"step_{step}"
    tmp = ckpt_dir / f".tmp_step_{step}"
    if is_main:
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir()

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(state)
    arrays = {}
    manifest_leaves = []
    for i, (path, leaf) in enumerate(leaves_with_paths):
        if (
            isinstance(leaf, jax.Array)
            and not leaf.is_fully_addressable
            and not leaf.is_fully_replicated
        ):
            # multi-host + sharded (e.g. tp over hosts): replicate across
            # processes (a collective all-gather correct for ANY dim
            # layout) so process 0 can materialize the global value
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(leaf.sharding.mesh, PartitionSpec())
            leaf = jax.jit(lambda x: x, out_shardings=rep)(leaf)
        arr = np.asarray(jax.device_get(leaf))
        key = f"leaf_{i}"
        arrays[key] = arr
        manifest_leaves.append({"path": _keystr(path), "key": key, "dtype": str(arr.dtype)})
    if not is_main:
        return target
    np.savez(tmp / _ARRAYS, **arrays)
    (tmp / _MANIFEST).write_text(
        json.dumps(
            {
                "step": int(step),
                "format": 1,
                "treedef": str(treedef),
                "leaves": manifest_leaves,
            },
            indent=1,
        )
    )
    if target.exists():
        shutil.rmtree(target)
    tmp.rename(target)

    if max_checkpoints is not None:
        steps = all_steps(ckpt_dir)
        for old in steps[: max(0, len(steps) - max_checkpoints)]:
            shutil.rmtree(ckpt_dir / f"step_{old}", ignore_errors=True)
    return target


def all_steps(ckpt_dir: str | Path) -> list[int]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return []
    steps = []
    for p in ckpt_dir.iterdir():
        m = _STEP_RE.match(p.name)
        if m and (p / _MANIFEST).exists():
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_step(ckpt_dir: str | Path) -> int | None:
    steps = all_steps(ckpt_dir)
    return steps[-1] if steps else None


def restore(ckpt_dir: str | Path, example_state: Any, step: int | None = None) -> Any:
    """Restore a checkpoint into the structure of ``example_state``.

    ``example_state`` supplies the pytree structure (as produced by the
    caller's init path); leaf values are replaced by the stored arrays.
    Raises ``FileNotFoundError`` if no checkpoint exists.
    """
    ckpt_dir = Path(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    target = ckpt_dir / f"step_{step}"
    manifest = json.loads((target / _MANIFEST).read_text())
    with np.load(target / _ARRAYS) as data:
        stored = {leaf["path"]: data[leaf["key"]] for leaf in manifest["leaves"]}

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(example_state)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = _keystr(path)
        if key not in stored:
            raise KeyError(f"checkpoint {target} missing leaf {key}")
        arr = stored[key]
        ref = np.asarray(leaf)
        if ref.shape != arr.shape:
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != expected {ref.shape}"
            )
        # preserve the example's dtype intent (e.g. bf16 params stored as bf16)
        new_leaves.append(arr.astype(ref.dtype) if ref.dtype != arr.dtype else arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def restore_subtree(
    ckpt_dir: str | Path, example: Any, prefix: str, step: int | None = None
) -> Any:
    """Restore only the leaves under ``prefix`` of a larger checkpoint into
    ``example``'s structure — e.g. ``prefix=".params"`` pulls just the model
    parameters out of a full TrainState checkpoint (the generation-time use
    case; reference analog: load_model's state_dict-only restore,
    wavenet/train.py:53-73)."""
    ckpt_dir = Path(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    target = ckpt_dir / f"step_{step}"
    manifest = json.loads((target / _MANIFEST).read_text())
    with np.load(target / _ARRAYS) as data:
        stored = {
            leaf["path"][len(prefix):]: data[leaf["key"]]
            for leaf in manifest["leaves"]
            if leaf["path"].startswith(prefix)
        }
    if not stored:
        raise KeyError(f"checkpoint {target} has no leaves under {prefix!r}")
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(example)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = _keystr(path)
        if key not in stored:
            raise KeyError(f"checkpoint {target}:{prefix} missing leaf {key}")
        ref = np.asarray(leaf)
        arr = stored[key]
        if ref.shape != arr.shape:
            raise ValueError(f"leaf {key} shape {arr.shape} != expected {ref.shape}")
        new_leaves.append(arr.astype(ref.dtype) if ref.dtype != arr.dtype else arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def leaf_shapes(
    ckpt_dir: str | Path, prefix: str = "", step: int | None = None
) -> dict[str, tuple]:
    """Shapes of stored leaves under ``prefix`` (keystr paths relative to
    the prefix) — lets callers build a shape-correct example pytree before
    :func:`restore_subtree` when a config dimension (e.g. a conditioning
    width) is only recorded in the trained parameter shapes."""
    ckpt_dir = Path(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    target = ckpt_dir / f"step_{step}"
    manifest = json.loads((target / _MANIFEST).read_text())
    with np.load(target / _ARRAYS) as data:
        return {
            leaf["path"][len(prefix):]: data[leaf["key"]].shape
            for leaf in manifest["leaves"]
            if leaf["path"].startswith(prefix)
        }


def restore_or_init(ckpt_dir: str | Path, init_state: Any) -> tuple[Any, int]:
    """Resume-if-present: returns ``(state, step)`` — ``(init_state, 0)`` when
    no checkpoint exists.  Replaces the reference's filename-parsing resume
    (wavenet/train.py:97-106) and log-re-reading step recovery
    (wavenet/train.py:160-167)."""
    step = latest_step(ckpt_dir)
    if step is None:
        return init_state, 0
    return restore(ckpt_dir, init_state, step), step
