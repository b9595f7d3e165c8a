"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh/shard_map) are exercised without TPU hardware. Must run before any
jax import (hence the env mutation at module import time)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Some environments register a TPU PJRT plugin that overrides JAX_PLATFORMS;
# the config API wins over the plugin, so force CPU explicitly as well.
jax.config.update("jax_platforms", "cpu")

import re

import numpy as np
import pytest

DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "msrd_b2s3")

# --- Skip audit (VERDICT r2 #8) -------------------------------------------
# Every skip must carry an allowlisted reason; a skip whose reason is not
# recognized FAILS instead. This prevents permanently-dead tests from
# accumulating silently — the reference's disease: its real-dataset tests
# skipped forever on hardcoded developer paths ("G:/Datasets/TUM",
# /root/reference/tests/datasets/test_tum.py:14-17, SURVEY §4.7) and nobody
# noticed they never ran in CI.
SKIP_REASON_ALLOWLIST = [
    # virtual-device mesh tests when run outside the 8-device conftest env
    r"needs \d+ \(virtual\) devices",
    # native C++ loader is an optional build artifact (native/build.sh)
    r"native frameio library not built",
    # inverse condition of the lazy-import failure test
    r"plotly installed; lazy-import failure not testable",
    # optional host-side deps, absent in minimal environments
    r"could not import 'plotly",
    r"could not import 'open3d",
    r"could not import 'imageio",
    r"could not import 'torch",
    r"could not import 'scipy",
    r"could not import 'jax",
    # tests that need the real accelerator (run in the TPU lane, not CPU CI)
    r"requires a TPU backend",
]


def _skip_reason(report) -> str:
    reason = (report.longrepr[2] if isinstance(report.longrepr, tuple)
              else str(report.longrepr))
    return reason.removeprefix("Skipped: ")


def _audit_skip(report, label: str) -> None:
    """Turn a skip whose reason is not allowlisted into a failure (shared by
    the test-level and collection-level hooks)."""
    if not report.skipped:
        return
    reason = _skip_reason(report)
    if not any(re.search(p, reason) for p in SKIP_REASON_ALLOWLIST):
        report.outcome = "failed"
        report.longrepr = (
            f"unexpected {label}skip reason: {reason!r}\n"
            "Skip reasons must match tests/conftest.py "
            "SKIP_REASON_ALLOWLIST (skip-audit; VERDICT r2 #8) so that "
            "permanently-dead tests cannot accumulate silently."
        )


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    _audit_skip(outcome.get_result(), "")


def pytest_collectreport(report):
    """Collection-level skips (module-level ``pytest.skip(...,
    allow_module_level=True)`` / ``pytest.importorskip``) never reach
    ``pytest_runtest_makereport`` — audit them here too, else a whole dead
    module slips past the allowlist."""
    _audit_skip(report, "module-level ")


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    skipped = terminalreporter.stats.get("skipped", [])
    if not skipped:
        return
    terminalreporter.write_sep("-", "skip audit (allowlisted reasons)")
    reasons = {}
    for rep in skipped:
        reasons.setdefault(_skip_reason(rep), []).append(rep.nodeid)
    for reason, nodes in sorted(reasons.items()):
        terminalreporter.write_line(f"{len(nodes):3d}x {reason}")


@pytest.fixture(scope="session")
def msrd():
    """Golden fixture from the reference test-suite (tests/data/msrd_b2s3):
    colors/depths/intrinsics/poses plus precomputed vertex/normal/global maps,
    shapes (2, 3, 120, 160, *)."""
    names = [
        "colors",
        "depths",
        "intrinsics",
        "poses",
        "vertex_map",
        "normal_map",
        "global_vertex_map",
        "global_normal_map",
    ]
    return {n: np.load(os.path.join(DATA_DIR, f"{n}.npy")) for n in names}


@pytest.fixture(scope="session")
def synthetic_clip():
    """Factory for small synthetic RGB-D clips (procedural static scene)."""
    import jax.numpy as jnp

    from gradslam_tpu import RGBDImages
    from gradslam_tpu.datasets import synthetic_sequence

    def make(B=1, L=4, H=16, W=24, seed=0):
        rgb, depth, intrinsics, poses = synthetic_sequence(B, L, H, W, seed=seed)
        return RGBDImages(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(intrinsics),
            jnp.asarray(poses),
        )

    return make
