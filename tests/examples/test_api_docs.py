"""CI guard for the generated API reference (docs/api/*.md).

Mirrors the reference's docs-built-in-CI contract
(/root/reference/.circleci/config.yml:27-32): the per-module API pages must
stay in sync with the code, and every public symbol must have a docstring.
`scripts/gen_api_docs.py --check` fails on either.
"""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def test_api_docs_fresh_and_complete():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_api_docs.py"),
         "--check"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, (
        "API docs stale or docstrings missing — run "
        "`python scripts/gen_api_docs.py`:\n" + r.stdout + r.stderr
    )
