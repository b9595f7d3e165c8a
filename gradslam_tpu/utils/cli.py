r"""Small CLI helpers shared by the example scripts.

The reference's examples are the de-facto CLI (SURVEY §2.2 — there is no
installed console entry point); ours add options the reference lacks, and the
spec parsers for those options live here so every example accepts the same
syntax with the same error messages.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Point JAX at a persistent compilation cache so re-running a script
    skips the (minutes-long at 640x480) XLA compile of the fused SLAM
    program. Called by every example CLI and benchmark; honors
    ``JAX_COMPILATION_CACHE_DIR`` when set, defaulting to
    ``~/.jaxcache``. No-op if jax is configured already."""
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".jaxcache"),
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def parse_pyramid(spec: Optional[str]) -> Optional[List[Tuple[int, int]]]:
    """Parse a coarse-to-fine odometry schedule ``'ds:iters,ds:iters,...'``.

    ``'8:6,4:4' -> [(8, 6), (4, 4)]``; ``None`` passes through. Raises
    ``SystemExit`` with a readable message on a malformed spec (this is a
    CLI-argument parser — tracebacks help nobody at the shell).
    """
    if spec is None:
        return None
    try:
        levels = [
            tuple(int(x) for x in level.split(":")) for level in spec.split(",")
        ]
    except ValueError as e:
        raise SystemExit(f"Bad --pyramid spec {spec!r}: {e}")
    for level in levels:
        if len(level) != 2:
            raise SystemExit(
                f"Bad --pyramid spec {spec!r}: each level must be "
                f"'dsratio:numiters', got {':'.join(map(str, level))!r}"
            )
    return levels
