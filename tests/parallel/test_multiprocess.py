"""Multi-process multi-chip dry run (VERDICT r2 #5): jax.distributed with N
local worker processes, gloo cross-process collectives — the SURVEY §2.3
multi-node runtime row. The script under test spawns fresh processes (a
clean JAX runtime per worker), so this test just drives the parent and
checks the aggregate verdict."""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
SCRIPT = os.path.join(REPO, "scripts", "multiprocess_dryrun.py")


@pytest.mark.slow
def test_two_process_dryrun():
    env = dict(os.environ)
    # children reset platform/devices themselves; keep the parent env clean
    r = subprocess.run(
        [sys.executable, SCRIPT, "--nproc", "2", "--local-devices", "2"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "multiprocess dryrun ok" in r.stdout
    # both processes ran both paths
    for pid in (0, 1):
        assert f"[proc {pid}] train step ok" in r.stdout
        assert f"[proc {pid}] shard_map fusion ok" in r.stdout
