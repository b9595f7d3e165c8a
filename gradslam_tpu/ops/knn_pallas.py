r"""Pallas TPU kernel for brute-force 1-nearest-neighbour association.

This is the TPU equivalent of the reference's chamferdist CUDA KNN
(``/root/reference/gradslam/odometry/icputils.py:3,200`` — the hot kernel of
the whole system). One fused kernel per (batch, src-tile) grid cell:

- the full target set lives in VMEM (ICP targets are <= a few 100k points,
  well under the 16 MB budget),
- the ``src x tgt`` cross-term rides the MXU tile by tile
  (``jax.lax.dot_general`` with fp32 accumulation),
- a running (min-dist, argmin) pair is folded across target tiles in
  registers/VMEM — the ``N x M`` distance matrix never exists.

The pure-XLA fallback (:mod:`gradslam_tpu.ops.knn`) streams target tiles
through a ``lax.scan``; it is correct everywhere but pays per-step dispatch
overhead. This kernel fuses the whole search.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import _apply_tgt_mask

__all__ = ["nn_points_pallas"]

_SRC_TILE = 512
_TGT_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn_kernel(src_ref, tgt_ref, invalid_ref, dists_ref, idx_ref):
    """Single-program kernel: all of src/tgt live in VMEM (ICP-sized point
    sets are a few 100 KB). Loops over src tiles x tgt tiles; the cross-term
    rides the MXU; the running argmin stays in registers.

    The per-tile argmin is min-then-recover: a pure min-reduction for the
    distance, then ``min(where(d2 == best, lane_iota, BIG))`` for the index.
    Mosaic lowers ``jnp.argmin`` to (value, index)-carrying select chains
    that run ~2.3x slower than two plain min-reductions at ICP sizes
    (measured on v5e, 19k x 20k: 21.5 -> 9.5 ms kernel time); the recovered
    index is exactly ``argmin``'s (smallest index among equal minima)."""
    Np = src_ref.shape[0]
    Mp = tgt_ref.shape[0]
    n_src = Np // _SRC_TILE
    n_tgt = Mp // _TGT_TILE
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SRC_TILE, _TGT_TILE), 1)

    def src_body(i, _):
        src = src_ref[pl.ds(i * _SRC_TILE, _SRC_TILE), :]  # (SRC_TILE, 4)
        s2 = jnp.sum(src * src, axis=-1, keepdims=True)

        def tgt_body(t, carry):
            best_d, best_i = carry
            tgt = tgt_ref[pl.ds(t * _TGT_TILE, _TGT_TILE), :]
            pen = invalid_ref[0, pl.ds(t * _TGT_TILE, _TGT_TILE)]
            t2 = jnp.sum(tgt * tgt, axis=-1)
            cross = jax.lax.dot_general(
                src,
                tgt,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes
            )
            d2 = s2 + (t2 + pen)[None, :] - 2.0 * cross
            tile_best = jnp.min(d2, axis=1)
            tile_arg = (
                jnp.min(
                    jnp.where(
                        d2 == tile_best[:, None], lane_iota, jnp.int32(2**30)
                    ),
                    axis=1,
                )
                + t * _TGT_TILE
            )
            take = tile_best < best_d
            return (
                jnp.where(take, tile_best, best_d),
                jnp.where(take, tile_arg, best_i),
            )

        init = (
            jnp.full((_SRC_TILE,), 1e30, dtype=jnp.float32),
            jnp.zeros((_SRC_TILE,), dtype=jnp.int32),
        )
        best_d, best_i = jax.lax.fori_loop(0, n_tgt, tgt_body, init)
        dists_ref[0, pl.ds(i * _SRC_TILE, _SRC_TILE)] = jnp.maximum(best_d, 0.0)
        idx_ref[0, pl.ds(i * _SRC_TILE, _SRC_TILE)] = best_i
        return 0

    jax.lax.fori_loop(0, n_src, src_body, 0)


@functools.partial(jax.jit, static_argnames=())
def _nn_pallas_single(src4, tgt4, invalid):
    Np = src4.shape[0]
    Mp = tgt4.shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((1, Np), jnp.float32),
        jax.ShapeDtypeStruct((1, Np), jnp.int32),
    )
    dists, idx = pl.pallas_call(
        _knn_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Mp * 4,
            bytes_accessed=(Np * 4 + Mp * 4) * 4 + Np * 8,
            transcendentals=0,
        ),
    )(src4, tgt4, invalid)
    return dists[0], idx[0]


def nn_points_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""Pallas 1-NN: same contract as :func:`gradslam_tpu.ops.knn.nn_points`
    (squared distances + int32 indices; masked targets can't win), except the
    kernel computes in float32 — inputs are cast and float32 distances
    returned regardless of input dtype (``nn_points_auto`` therefore only
    routes float32 inputs here).

    Requires the padded source AND target sets to fit in VMEM together
    (``~24 B``/src row + ``~20 B``/tgt row) — fine for all ICP workloads in
    this framework; ``nn_points_auto`` budget-checks before dispatching.
    """
    src = jnp.asarray(src)
    tgt = jnp.asarray(tgt)
    # Same validation as the XLA path (knn.py) — without it a mixed-rank
    # call would silently read M from the wrong axis or die in an opaque
    # broadcast error, and error behavior would depend on which backend
    # nn_points_auto picked.
    if src.shape[-1] != 3 or tgt.shape[-1] != 3:
        raise ValueError(
            f"src/tgt must have trailing dim 3. Got {src.shape} and {tgt.shape}."
        )
    if src.ndim != tgt.ndim or src.ndim not in (2, 3):
        raise ValueError(
            f"src and tgt must both be (N, 3) or (B, N, 3). "
            f"Got {src.shape} and {tgt.shape}."
        )
    batched = src.ndim == 3
    if not batched:
        src, tgt = src[None], tgt[None]
        tgt_mask = None if tgt_mask is None else tgt_mask[None]
    B, N, _ = src.shape
    M = tgt.shape[1]
    Np = _round_up(max(N, 1), _SRC_TILE)
    Mp = _round_up(max(M, 1), _TGT_TILE)

    if tgt_mask is not None:
        tgt_mask = jnp.asarray(tgt_mask)
        # Shared masked-target preprocessing (zeroes NaN/inf padding garbage
        # that would otherwise poison its whole target tile).
        tgt, _ = _apply_tgt_mask(tgt, tgt_mask, jnp.float32)
    src4 = jnp.zeros((B, Np, 4), dtype=jnp.float32).at[:, :N, :3].set(src)
    tgt4 = jnp.zeros((B, Mp, 4), dtype=jnp.float32).at[:, :M, :3].set(tgt)
    if tgt_mask is None:
        invalid = jnp.zeros((B, 1, Mp), dtype=jnp.float32).at[:, :, M:].set(1e30)
    else:
        pen = jnp.where(tgt_mask, 0.0, 1e30).astype(jnp.float32)
        invalid = jnp.full((B, 1, Mp), 1e30, dtype=jnp.float32).at[:, 0, :M].set(pen)

    dists, idx = jax.vmap(_nn_pallas_single)(src4, tgt4, invalid)
    return dists[:, :N] if batched else dists[0, :N], (
        idx[:, :N] if batched else idx[0, :N]
    )
