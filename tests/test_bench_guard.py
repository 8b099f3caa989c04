"""bench.py outage hardening (VERDICT r3 #1).

Round 3's driver capture (BENCH_r03.json) was rc=1 with no JSON because the
axon relay was down at capture time and the headline block had no guard.
These tests force an outage and assert the two contracted behaviors:

- ``_backend_ready`` is *bounded*: a hanging ``jax.devices()`` (the observed
  failure mode — it hangs, it does not raise) cannot stall the bench past
  its probe timeout, and raising probes are retried with backoff.
- ``main`` prints exactly ONE parseable JSON line on EVERY exit path; on
  terminal failure the line carries a machine-readable ``error`` plus the
  ``last_good`` hardware numbers.
"""

import io
import json
import time
from contextlib import redirect_stdout

import pytest

import bench

pytestmark = pytest.mark.fast


def test_probe_bounds_a_hanging_backend():
    def hang():
        time.sleep(30.0)

    t0 = time.perf_counter()
    ok, cause = bench._probe_once(hang, timeout_s=0.2)
    assert not ok
    assert "timed out" in cause
    assert time.perf_counter() - t0 < 5.0


def test_backend_ready_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: relay down")
        return ["fake-device"]

    ok, cause = bench._backend_ready(
        attempts=3, probe_timeout_s=1.0, backoff_s=0.01, devices_fn=flaky
    )
    assert ok and cause is None
    assert len(calls) == 3


def test_backend_ready_terminal_failure_reports_cause():
    def dead():
        raise RuntimeError("UNAVAILABLE: Unable to initialize backend 'axon'")

    ok, cause = bench._backend_ready(
        attempts=2, probe_timeout_s=1.0, backoff_s=0.01, devices_fn=dead
    )
    assert not ok
    assert "UNAVAILABLE" in cause


def _run_main_capture(monkeypatch, **patches):
    for name, value in patches.items():
        monkeypatch.setattr(bench, name, value)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one JSON line, got {lines}"
    return json.loads(lines[0])


def test_main_prints_error_json_on_backend_outage(monkeypatch):
    out = _run_main_capture(
        monkeypatch,
        _backend_ready=lambda **kw: (False, "forced outage"),
    )
    assert out["metric"] == "wavenet_fast_generate_throughput_single_stream"
    assert out["value"] is None
    assert "forced outage" in out["error"]
    assert out["last_good"]["value"] > 0
    assert out["last_good"]["vs_baseline"] > 1.0


def test_sigterm_interrupt_escapes_block_guards_and_flushes_json(monkeypatch):
    """The driver runs ``timeout 580 python bench.py``; SIGTERM mid-block
    must flush the one JSON line with every block measured so far.  The
    interrupt is a BaseException so per-block ``except Exception`` guards
    cannot swallow it."""
    assert not issubclass(bench._BenchInterrupted, Exception)

    def slow_blocks(out):
        out["value"] = 456.0
        try:  # a block-level guard, as in _run_benchmarks
            raise bench._BenchInterrupted("signal 15")
        except Exception:
            pytest.fail("block guard swallowed the interrupt")

    out = _run_main_capture(
        monkeypatch,
        _backend_ready=lambda **kw: (True, None),
        _run_benchmarks=slow_blocks,
    )
    assert out["value"] == 456.0
    assert "signal 15" in out["error"]


def test_sigterm_handler_raises_in_main_thread():
    import os
    import signal as _signal

    prev = _signal.getsignal(_signal.SIGTERM)
    try:
        bench._install_sigterm_flush()
        with pytest.raises(bench._BenchInterrupted):
            os.kill(os.getpid(), _signal.SIGTERM)
    finally:
        _signal.signal(_signal.SIGTERM, prev)


def test_main_prints_json_when_benchmarks_raise_midway(monkeypatch):
    def boom(out):
        out["value"] = 123.0  # partial fill, then die
        raise RuntimeError("kernel exploded")

    out = _run_main_capture(
        monkeypatch,
        _backend_ready=lambda **kw: (True, None),
        _run_benchmarks=boom,
    )
    assert out["value"] == 123.0  # partial results survive
    assert "kernel exploded" in out["error"]
    assert out["last_good"]["value"] > 0
