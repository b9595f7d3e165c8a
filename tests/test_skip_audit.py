"""Meta-test for the skip audit (tests/conftest.py SKIP_REASON_ALLOWLIST).

The audit turns any skip whose reason is not allowlisted into a FAILURE, so
permanently-dead tests cannot accumulate silently — the reference's disease
(its real-dataset tests skipped forever on hardcoded developer paths,
/root/reference/tests/datasets/test_tum.py:14-17; SURVEY §4.7). Verified
end-to-end here by running pytest on throwaway test files in a subprocess.
"""

import subprocess
import sys
import textwrap

REPO = __file__.rsplit("/", 2)[0]


def _run_pytest(tmp_path, body):
    test_file = tmp_path / "test_tmp_skip.py"
    test_file.write_text(textwrap.dedent(body))
    # The temp file lives outside tests/, so conftest.py would not be
    # auto-discovered for it — load the audit plugin explicitly.
    return subprocess.run(
        [
            sys.executable, "-m", "pytest", "-q", str(test_file),
            "-p", "tests.conftest", "-p", "no:cacheprovider",
        ],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )


def test_unexpected_skip_reason_fails(tmp_path):
    r = _run_pytest(
        tmp_path,
        """
        import pytest

        def test_dead():
            pytest.skip("dataset not found at G:/Datasets/TUM")
        """,
    )
    assert r.returncode != 0, r.stdout + r.stderr
    assert "unexpected skip reason" in r.stdout


def test_unexpected_module_level_skip_fails(tmp_path):
    # module-level skips bypass pytest_runtest_makereport entirely; the
    # pytest_collectreport hook must catch them (this is the exact shape of
    # the reference's dead dataset tests)
    r = _run_pytest(
        tmp_path,
        """
        import pytest

        pytest.skip("dataset not found at G:/Datasets/TUM",
                    allow_module_level=True)

        def test_dead():
            pass
        """,
    )
    assert r.returncode != 0, r.stdout + r.stderr
    assert "unexpected module-level skip reason" in r.stdout


def test_allowlisted_module_level_skip_passes(tmp_path):
    r = _run_pytest(
        tmp_path,
        """
        import pytest

        pytest.skip("needs 8 (virtual) devices",
                    allow_module_level=True)

        def test_gated():
            pass
        """,
    )
    # rc 5 = "no tests collected": the only module skipped, which is fine
    assert r.returncode in (0, 5), r.stdout + r.stderr
    assert "unexpected" not in r.stdout


def test_allowlisted_skip_reason_passes(tmp_path):
    r = _run_pytest(
        tmp_path,
        """
        import pytest

        def test_gated():
            pytest.skip("needs 8 (virtual) devices")
        """,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "1 skipped" in r.stdout
