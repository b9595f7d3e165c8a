"""Smoke test for the benchmark driver contract: bench.py must print one JSON
line with metric/value/unit/vs_baseline keys. Runs the real script at tiny
shapes (BENCH_TINY=1) on CPU — this is the interface an external harness
parses, so a trivial bug in bench.py must fail CI, not the benchmark run."""

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def test_bench_tiny_prints_json_contract():
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO, BENCH_TINY="1"
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    # Core driver contract plus the compile-time fields added for
    # VERDICT r2 #7 (a compile-time regression must not ship silently).
    assert set(rec) == {
        "metric", "value", "unit", "vs_baseline", "trace_s", "compile_s"
    }
    assert rec["unit"] == "frames/s"
    assert rec["value"] > 0
    assert rec["trace_s"] >= 0 and rec["compile_s"] >= 0
