r"""Nearest-neighbour association on TPU.

The reference delegates 1-NN association to ``chamferdist.chamfer.knn_points``,
a CUDA/C++ PyTorch extension (``/root/reference/gradslam/odometry/icputils.py:3``,
called at :200) — the hot kernel of the whole system (SURVEY §2.4). This module
provides the TPU-native equivalent: tiled brute-force 1-NN where the
``src @ tgt^T`` cross-term rides the MXU, the target set is streamed in tiles
through a ``lax.scan`` carrying a running (min-dist, argmin) pair, and the
``N x M`` distance matrix is never materialised in HBM.

Distances returned are *squared* euclidean distances, matching chamferdist.

Masked (padded) target points are supported: they are pushed to +inf distance
and can never win the argmin — this is how the fixed-capacity padded map buffer
plugs into ICP without dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.precision import HIGHEST

__all__ = ["nn_points", "knn_points"]

_INF = jnp.float32(1e30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tile_size",))
def _nn_single(
    src: jnp.ndarray,  # (N, 3)
    tgt: jnp.ndarray,  # (M, 3)
    tgt_invalid: jnp.ndarray,  # (M,) float32: 0 for valid, +inf for invalid
    tile_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = src.shape[0]
    M = tgt.shape[0]
    Mp = _round_up(max(M, 1), tile_size)
    pad = Mp - M
    tgt = jnp.pad(tgt, ((0, pad), (0, 0)))
    tgt_invalid = jnp.pad(tgt_invalid, (0, pad), constant_values=_INF)

    tgt_tiles = tgt.reshape(Mp // tile_size, tile_size, 3)
    inv_tiles = tgt_invalid.reshape(Mp // tile_size, tile_size)

    s2 = jnp.sum(src * src, axis=-1)  # (N,)

    def body(carry, xs):
        best_d, best_i = carry
        tile, inv, tile_idx = xs
        t2 = jnp.sum(tile * tile, axis=-1)  # (tile,)
        # Cross term on the MXU; HIGHEST precision — bf16 passes would corrupt
        # the cancellation-sensitive |s|^2 + |t|^2 - 2 s.t form.
        cross = jax.lax.dot_general(
            src,
            tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=HIGHEST,
        )  # (N, tile)
        d2 = s2[:, None] + t2[None, :] - 2.0 * cross + inv[None, :]
        tile_best = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + tile_idx * tile_size
        take = tile_best < best_d
        return (
            jnp.where(take, tile_best, best_d),
            jnp.where(take, tile_arg, best_i),
        ), None

    # The zero-value terms tie the init carry's type to the operands so the
    # scan is legal under shard_map when src/tgt vary over a mesh axis (the
    # carry must carry the same varying-axes tag as the body output).
    vma0f = 0.0 * (src[0, 0] + tgt[0, 0])
    init = (
        jnp.full((N,), _INF, dtype=src.dtype) + vma0f,
        jnp.zeros((N,), dtype=jnp.int32) + vma0f.astype(jnp.int32),
    )
    tile_ids = jnp.arange(Mp // tile_size, dtype=jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(body, init, (tgt_tiles, inv_tiles, tile_ids))
    # Clamp tiny negative values from the expanded-form cancellation.
    return jnp.maximum(best_d, 0.0), best_i


def nn_points(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: Optional[jnp.ndarray] = None,
    tile_size: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""1-nearest-neighbour from each ``src`` point to the ``tgt`` set.

    Args:
        src: ``(N, 3)`` or batched ``(B, N, 3)`` source points.
        tgt: ``(M, 3)`` or batched ``(B, M, 3)`` target points.
        tgt_mask: optional ``(M,)`` / ``(B, M)`` bool validity mask for padded
            targets.
        tile_size: target tile streamed through VMEM per scan step.

    Returns:
        ``(dists, idx)`` — squared distances ``(.., N)`` and target indices
        ``(.., N)`` int32.
    """
    src = jnp.asarray(src)
    tgt = jnp.asarray(tgt)
    if src.shape[-1] != 3 or tgt.shape[-1] != 3:
        raise ValueError(
            f"src/tgt must have trailing dim 3. Got {src.shape} and {tgt.shape}."
        )
    if src.ndim != tgt.ndim:
        raise ValueError(
            f"src and tgt must have the same rank. Got {src.shape} and {tgt.shape}."
        )
    batched = src.ndim == 3
    if tgt_mask is None:
        invalid = jnp.zeros(tgt.shape[:-1], dtype=src.dtype)
    else:
        invalid = jnp.where(jnp.asarray(tgt_mask), 0.0, _INF).astype(src.dtype)
    fn = functools.partial(_nn_single, tile_size=tile_size)
    if batched:
        return jax.vmap(fn)(src, tgt, invalid)
    return fn(src, tgt, invalid)


def knn_points(src: jnp.ndarray, tgt: jnp.ndarray, tgt_mask=None):
    r"""chamferdist-compatible alias: returns an object with ``.dists`` and
    ``.idx`` of shape ``(B, N, 1)`` (parity with the reference call site
    icputils.py:200)."""

    class _KNNResult:
        __slots__ = ("dists", "idx")

        def __init__(self, dists, idx):
            self.dists = dists
            self.idx = idx

    squeeze = src.ndim == 2
    if squeeze:
        src, tgt = src[None], tgt[None]
        tgt_mask = None if tgt_mask is None else tgt_mask[None]
    d, i = nn_points(src, tgt, tgt_mask)
    return _KNNResult(d[..., None], i[..., None])
