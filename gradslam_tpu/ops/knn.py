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
import numpy as np

from ..utils.precision import HIGHEST

__all__ = ["nn_points", "knn_points"]

# Host-side numpy scalar, NOT jnp: a module-level ``jnp.float32`` would live
# on whatever device is default at import time and every later trace that
# closes over it pays a blocking device-to-host read at lowering (measured:
# minutes-long stalls over a remote-TPU tunnel).
_INF = np.float32(1e30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _apply_tgt_mask(
    tgt: jnp.ndarray, tgt_mask: Optional[jnp.ndarray], dtype
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared masked-target preprocessing for every KNN backend.

    Returns ``(tgt_zeroed, invalid)``: masked rows are ZEROED (a NaN/inf in
    padding garbage would otherwise poison its whole tile's min/top-k
    reduction, silently excluding the tile's VALID targets) and ``invalid``
    carries the +inf distance penalty that keeps masked rows from winning.
    """
    if tgt_mask is None:
        return tgt, jnp.zeros(tgt.shape[:-1], dtype=dtype)
    tgt_mask = jnp.asarray(tgt_mask)
    invalid = jnp.where(tgt_mask, 0.0, _INF).astype(dtype)
    return jnp.where(tgt_mask[..., None], tgt, 0.0), invalid


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
    # carry must carry the same varying-axes tag as the body output). The
    # isfinite guard keeps the coupling VALUE-free: without it a NaN/inf in
    # src[0] or tgt[0] poisons the init best-dist and every row's
    # association silently degenerates to index 0.
    _v = src[0, 0] + tgt[0, 0]
    vma0f = 0.0 * jnp.where(jnp.isfinite(_v), _v, 0.0)
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
    tgt, invalid = _apply_tgt_mask(tgt, tgt_mask, src.dtype)
    fn = functools.partial(_nn_single, tile_size=tile_size)
    if batched:
        return jax.vmap(fn)(src, tgt, invalid)
    return fn(src, tgt, invalid)


@functools.partial(jax.jit, static_argnames=("K", "tile_size"))
def _knn_k_single(
    src: jnp.ndarray,  # (N, 3)
    tgt: jnp.ndarray,  # (M, 3)
    tgt_invalid: jnp.ndarray,  # (M,) float32: 0 valid, +inf invalid
    K: int,
    tile_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming K-nearest-neighbours: target tiles through a scan carrying
    the running (K best dists, K best indices); each step merges the carry
    with the tile's distances via ``lax.top_k`` (ties go to the smaller
    global index because the carry — earlier tiles — concatenates first and
    top_k is stable)."""
    N = src.shape[0]
    M = tgt.shape[0]
    Mp = _round_up(max(M, 1), tile_size)
    pad = Mp - M
    tgt = jnp.pad(tgt, ((0, pad), (0, 0)))
    tgt_invalid = jnp.pad(tgt_invalid, (0, pad), constant_values=_INF)
    tgt_tiles = tgt.reshape(Mp // tile_size, tile_size, 3)
    inv_tiles = tgt_invalid.reshape(Mp // tile_size, tile_size)
    s2 = jnp.sum(src * src, axis=-1)

    def body(carry, xs):
        best_d, best_i = carry  # (N, K) each
        tile, inv, tile_idx = xs
        t2 = jnp.sum(tile * tile, axis=-1)
        cross = jax.lax.dot_general(
            src, tile, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=HIGHEST,
        )
        d2 = s2[:, None] + t2[None, :] - 2.0 * cross + inv[None, :]
        idx = (
            jnp.arange(tile.shape[0], dtype=jnp.int32)[None, :]
            + tile_idx * tile_size
        )
        cand_d = jnp.concatenate([best_d, d2], axis=1)  # (N, K + tile)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(idx, d2.shape)], axis=1
        )
        top_negd, pos = jax.lax.top_k(-cand_d, K)
        return (-top_negd, jnp.take_along_axis(cand_i, pos, axis=1)), None

    init = (
        jnp.full((N, K), _INF, dtype=src.dtype),
        jnp.zeros((N, K), dtype=jnp.int32),
    )
    tile_ids = jnp.arange(Mp // tile_size, dtype=jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(body, init, (tgt_tiles, inv_tiles, tile_ids))
    return jnp.maximum(best_d, 0.0), best_i


class _KNNResult:
    """chamferdist/pytorch3d-style result: ``.dists``/``.idx`` ``(B, N, K)``,
    ``.knn`` gathered neighbour points ``(B, N, K, 3)`` when requested.
    Iterable/indexable like the pytorch3d namedtuple."""

    __slots__ = ("dists", "idx", "knn")

    def __init__(self, dists, idx, knn=None):
        self.dists = dists
        self.idx = idx
        self.knn = knn

    def __iter__(self):
        return iter((self.dists, self.idx, self.knn))

    def __getitem__(self, i):
        return (self.dists, self.idx, self.knn)[i]


def knn_points(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    lengths1: Optional[jnp.ndarray] = None,
    lengths2: Optional[jnp.ndarray] = None,
    K: int = 1,
    return_nn: bool = False,
    *,
    tgt_mask: Optional[jnp.ndarray] = None,
    tile_size: int = 1024,
):
    r"""chamferdist-compatible K-NN (the native dep the reference installs for
    its hot kernel — ``from chamferdist.chamfer import knn_points``,
    icputils.py:3). Returns ``.dists`` / ``.idx`` of shape ``(B, N, K)``
    (squared distances, ascending; ties to the smallest target index) and,
    with ``return_nn=True``, ``.knn`` gathered neighbours ``(B, N, K, 3)``.

    The positional order matches chamferdist/pytorch3d —
    ``knn_points(p1, p2, lengths1, lengths2, K, return_nn)`` — so reference
    code calling positionally works unchanged. TPU-specific extensions
    (``tgt_mask``, ``tile_size``) are keyword-only.

    ``lengths1/lengths2``: chamferdist-style valid counts per batch element —
    rows past ``lengths1`` are zeroed in the outputs; targets past
    ``lengths2`` can never be neighbours. ``tgt_mask`` is the general
    per-point alternative to ``lengths2``. Slots with no valid neighbour
    (fewer than ``K`` valid targets) are zero-padded — ``dists`` 0, ``idx``
    0 — matching pytorch3d, not left at the internal +inf sentinel.
    """
    src = jnp.asarray(src)
    tgt = jnp.asarray(tgt)
    if K < 1:
        raise ValueError(f"K must be >= 1. Got {K}.")
    if K > tgt.shape[-2]:
        raise ValueError(
            f"K ({K}) cannot exceed the number of target points "
            f"({tgt.shape[-2]})."
        )
    squeeze = src.ndim == 2
    if squeeze:
        src, tgt = src[None], tgt[None]
        tgt_mask = None if tgt_mask is None else jnp.asarray(tgt_mask)[None]
        if lengths1 is not None:
            lengths1 = jnp.atleast_1d(jnp.asarray(lengths1))
        if lengths2 is not None:
            lengths2 = jnp.atleast_1d(jnp.asarray(lengths2))
    B, M = tgt.shape[0], tgt.shape[1]
    if lengths2 is not None:
        range_mask = (
            jnp.arange(M, dtype=jnp.int32)[None, :]
            < jnp.asarray(lengths2, dtype=jnp.int32)[:, None]
        )
        tgt_mask = range_mask if tgt_mask is None else (tgt_mask & range_mask)

    # Zero masked rows ONCE, before the K dispatch: both reduction kernels
    # (NaN-poisoning guard) and the return_nn gather below read tgt, and the
    # gathered padding values must not depend on K.
    tgt, invalid = _apply_tgt_mask(tgt, tgt_mask, src.dtype)
    if K == 1:
        d, i = nn_points(src, tgt, tgt_mask, tile_size=tile_size)
        d, i = d[..., None], i[..., None]
    else:
        fn = functools.partial(_knn_k_single, K=K, tile_size=tile_size)
        d, i = jax.vmap(fn)(src, tgt, invalid)

    # Zero-pad slots that found no valid neighbour (fewer than K valid
    # targets): pytorch3d pads these with 0, not the internal +inf sentinel.
    # Real squared distances never approach the sentinel's magnitude.
    if tgt_mask is not None or lengths2 is not None:
        no_neighbour = d >= _INF * 0.5
        d = jnp.where(no_neighbour, 0.0, d)
        i = jnp.where(no_neighbour, 0, i)

    if lengths1 is not None:
        row_ok = (
            jnp.arange(src.shape[1], dtype=jnp.int32)[None, :]
            < jnp.asarray(lengths1, dtype=jnp.int32)[:, None]
        )[..., None]
        d = jnp.where(row_ok, d, 0.0)
        i = jnp.where(row_ok, i, 0)
    nn = None
    if return_nn:
        nn = jnp.take_along_axis(tgt[:, :, None, :], i[..., None], axis=1)
    if squeeze:
        d, i = d[0], i[0]
        nn = None if nn is None else nn[0]
    return _KNNResult(d, i, nn)
