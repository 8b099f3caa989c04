"""Serialized end-of-round hardware validation sweep.

Runs every serving/kernel hardware validation back-to-back as
subprocesses (CLAUDE.md: TPU jobs must be serialized — relay contention
distorts timings and can starve the host), collects each module's
one-line JSON, and writes one combined artifact.  The sweep is the
round's final "everything still green on real hardware" receipt after
the last kernel/planner changes.

Run: ``python -m benchmarks.final_validation_sweep``
(~25-40 min warm; add module names as args to run a subset).
Prints one JSON line; artifact goes to benchmarks/artifacts/.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

MODULES = [
    "benchmarks.rings_hw_validation",
    "benchmarks.long_serving_validation",
    "benchmarks.session_serving_validation",
    "benchmarks.ae_serving_validation",
    "benchmarks.ae_session_validation",
]


def last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main(argv):
    mods = [m if m.startswith("benchmarks.") else f"benchmarks.{m}"
            for m in argv] or MODULES
    t0 = time.time()
    results = {}
    all_ok = True
    for mod in mods:
        print(f"# running {mod} ...", file=sys.stderr)
        t1 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", mod], capture_output=True, text=True,
            timeout=3600,
        )
        parsed = last_json_line(proc.stdout)
        ok = proc.returncode == 0 and parsed is not None and bool(
            parsed.get("ok", parsed.get("all_exact", True))
        )
        results[mod] = {
            "rc": proc.returncode,
            "ok": ok,
            "wall_s": round(time.time() - t1, 1),
            "result": parsed if parsed is not None else {
                "error": (proc.stderr or proc.stdout)[-500:]
            },
        }
        all_ok = all_ok and ok
        print(f"# {mod}: ok={ok} ({results[mod]['wall_s']}s)",
              file=sys.stderr)
    out = {
        "metric": "final_validation_sweep",
        "modules": results,
        "ok": all_ok,
        "wall_s": round(time.time() - t0, 1),
    }
    art = Path("benchmarks/artifacts/final_validation_sweep_r5.json")
    art.parent.mkdir(parents=True, exist_ok=True)
    art.write_text(json.dumps(out, indent=1))
    print(json.dumps({
        "metric": "final_validation_sweep", "ok": all_ok,
        "modules": {m: r["ok"] for m, r in results.items()},
        "wall_s": out["wall_s"],
    }))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
