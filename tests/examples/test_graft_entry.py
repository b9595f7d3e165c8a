"""Driver-contract tests for __graft_entry__.py.

``dryrun_multichip`` must self-bootstrap a virtual CPU mesh in a *bare*
process — no JAX_PLATFORMS/XLA_FLAGS preset (round-1 regression: the dryrun
assumed the caller had configured the platform, attached to a broken TPU
plugin and died). The in-suite conftest already forces CPU/8-devices, so the
bootstrap has to be exercised in a clean child process to mean anything.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _clean_env():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO
    return env


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_bare_process():
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip;"
            "dryrun_multichip(8); print('DRYRUN_OK')",
        ],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env=_clean_env(),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "DRYRUN_OK" in r.stdout


@pytest.mark.slow
def test_entry_compiles_bare_process():
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import entry\n"
            "import jax\n"
            "fn, args = entry()\n"
            "out = jax.jit(fn)(*args)\n"
            "jax.block_until_ready(out)\n"
            "print('ENTRY_OK')",
        ],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env=_clean_env(),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ENTRY_OK" in r.stdout


def test_bootstrap_devices_in_suite():
    """In-process path: enough devices already exist (conftest's 8-CPU mesh) —
    the bootstrap must return them untouched, without resetting backends."""
    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import _bootstrap_devices
    finally:
        sys.path.pop(0)
    import jax

    before = jax.devices()
    devs = _bootstrap_devices(8)
    assert len(devs) == 8
    assert jax.devices() == before
