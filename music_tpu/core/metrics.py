"""Metrics logging / observability.

The reference logs to append-only text files whose format is load-bearing —
resume re-parses ``lines[-1].split(' ')[2]`` (wavenet/train.py:149-167,
183-193) — and plots offline with matplotlib (wavenet/vis/visualize.py).

This module provides:
- ``MetricsLogger``: structured JSONL metrics + a reference-compatible
  ``loss_log.log`` text mirror (so the reference's vis tooling and log
  parsers keep working), plus a ``store_log.log``-style event channel.
- ``Meter``: streaming mean for loss averaging over a window
  (``print_every`` semantics, wavenet/train.py:183-193).
- ``Throughput``: samples/sec measurement used by the benchmark harness.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any


class Meter:
    """Streaming average over a reporting window."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.total += float(value) * n
        self.count += n

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)

    def reset(self):
        self.total, self.count = 0.0, 0


class Throughput:
    """Wall-clock items/sec meter (blocks on device work via the caller)."""

    def __init__(self):
        self.items = 0
        self._t0 = time.perf_counter()

    def update(self, n: int):
        self.items += n

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self.items / dt if dt > 0 else 0.0

    def reset(self):
        self.items = 0
        self._t0 = time.perf_counter()


class MetricsLogger:
    """Dual-format metrics sink.

    ``log_loss(epoch, step, loss)`` appends
    - a JSONL record to ``metrics.jsonl`` (structured, greppable), and
    - a text line ``'Trained over <N> pieces,Average loss is <loss>'`` to
      ``loss_log.log`` — byte-compatible with the reference's format
      (wavenet/train.py:188-190), whose token positions are load-bearing:
      the resume parser reads ``split(' ')[2]`` (wavenet/train.py:163) and
      the vis tool parses the trailing loss (wavenet/vis/visualize.py:7-15).
    """

    def __init__(self, log_dir: str | Path, echo: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = self.log_dir / "metrics.jsonl"
        self._loss_log = self.log_dir / "loss_log.log"
        self._store_log = self.log_dir / "store_log.log"
        self.echo = echo

    def log(self, record: dict[str, Any]):
        record = dict(record, time=time.time())
        with self._jsonl.open("a") as f:
            f.write(json.dumps(record) + "\n")
        if self.echo:
            print(" ".join(f"{k}={v}" for k, v in record.items() if k != "time"))

    def log_loss(self, epoch: int, step: int, loss: float, **extra: Any):
        self.log({"kind": "loss", "epoch": epoch, "step": step, "loss": float(loss), **extra})
        with self._loss_log.open("a") as f:
            f.write(f"Trained over {step} pieces,Average loss is {float(loss)}\n")

    def log_event(self, message: str, **extra: Any):
        self.log({"kind": "event", "message": message, **extra})
        with self._store_log.open("a") as f:
            f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')} {message}\n")

    def last_step(self) -> int:
        """Recover the last logged step (reference behavior:
        wavenet/train.py:160-167)."""
        if not self._loss_log.exists():
            return 0
        lines = self._loss_log.read_text().strip().splitlines()
        if not lines:
            return 0
        return int(lines[-1].split(" ")[2])
