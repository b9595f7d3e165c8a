r"""Profiling hooks (the reference has none — SURVEY §5: tracing ABSENT).

Thin wrappers over ``jax.profiler`` so pipeline stages show up as named
ranges in TPU traces, plus a wall-clock timer that forces device completion
(tunneled TPU backends can return from ``block_until_ready`` before remote
execution finishes, so the timer reads back a scalar checksum).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["annotate", "trace", "device_timer"]

annotate = jax.profiler.TraceAnnotation
"""Context manager naming a region inside a device trace."""


@contextlib.contextmanager
def trace(log_dir: str):
    r"""Capture a TPU trace for the enclosed block (viewable in XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def device_timer(label: str = "", result_box: Optional[list] = None):
    r"""Wall-clock a device computation reliably. The block must append its
    output arrays to ``result_box``; the timer reads one element back to
    force completion before stopping the clock."""
    box = result_box if result_box is not None else []
    t0 = time.perf_counter()
    yield box
    for out in jax.tree_util.tree_leaves(box):
        if hasattr(out, "dtype"):
            _ = float(jnp.ravel(out)[0])
    dt = time.perf_counter() - t0
    if label:
        print(f"[device_timer] {label}: {dt * 1000:.2f} ms")
    box.append(dt)
