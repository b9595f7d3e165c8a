r"""Map-axis-sharded PointFusion — explicit multi-chip fusion via
``jax.shard_map`` (new capability; the reference is single-device,
SURVEY §2.3).

For maps too large for one chip's HBM, the fixed-capacity buffer's point axis
is sharded over a mesh axis: each of the K shards owns ``CAP/K`` rows of
points/normals/colors/ccounts plus its own live counter. One fusion step
(reference fusionutils.py:761-789 semantics) becomes:

1. **Local association** — each shard projects ITS map rows into the frame
   (streaming math), gates them against the (replicated) frame, and selects
   per-pixel winners among its own rows with the flat 4-key sort (the exact
   lexicographic criterion of fusionutils.py:509-544, tie-broken by GLOBAL
   row index).
2. **Cross-shard winner reduction** — the only communication: each shard
   ``all_gather``s its three per-pixel winner tables (ccount, ray distance,
   global row index; ``3 * H*W * 4`` bytes) over the mesh axis and folds
   them lexicographically. These collectives ride ICI.
3. **Row-side merge + strided append** — the shard owning a pixel's winning
   row merges it in place (confidence-weighted average, gathering frame data
   at the row's own pixel); un-corresponded valid pixels are dealt
   round-robin across shards (pixel with append rank ``r`` goes to shard
   ``r % K``), so the map grows balanced with zero communication.

Winner semantics match the single-device path exactly up to the global row
numbering: appends land at different global rows than a single-device run,
so ties in (ccount, ray distance) — i.e. exactly duplicated points — may
tie-break differently. Point sets and confidence mass are identical.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import nn_points_auto
from ..slam.fusionutils import get_alpha
from ..slam.fusionutils import _project_map_points
from ..structures.pointclouds import Pointclouds
from ..structures.rgbdimages import RGBDImages

__all__ = ["ShardedMap", "MapShardedPointFusion", "nn_points_map_sharded"]


def nn_points_map_sharded(src, tgt_local, tgt_mask_local=None, *, axis_name):
    r"""1-NN against a target cloud sharded along its point axis.

    Runs inside ``shard_map``: each shard solves 1-NN against its local
    target rows, then one ``all_gather`` of the (distance, global-index)
    pairs folds to the global winner. Exact same result as single-device
    ``nn_points`` on the concatenated target (ties resolve to the smallest
    global index).
    """
    d, i = nn_points_auto(src, tgt_local, tgt_mask_local)
    C = tgt_local.shape[-2]
    base = jax.lax.axis_index(axis_name) * C
    gi = i + base
    ad = jax.lax.all_gather(d, axis_name, axis=0)  # (K, ..., N)
    ai = jax.lax.all_gather(gi, axis_name, axis=0)
    best_d, best_i = ad[0], ai[0]
    for k in range(1, ad.shape[0]):
        take = ad[k] < best_d  # strict: ties keep the earlier (smaller) index
        best_d = jnp.where(take, ad[k], best_d)
        best_i = jnp.where(take, ai[k], best_i)
    return best_d, best_i


class ShardedMap(NamedTuple):
    r"""Map buffers sharded along the capacity axis.

    ``points/normals/colors/features`` are global ``(B, CAP, ·)`` arrays
    placed with the point axis sharded; ``num_points`` is ``(K, B)`` — one
    live counter per shard (each shard's valid rows are a prefix of its own
    ``CAP/K``-row slice, NOT of the global buffer).
    """

    points: jnp.ndarray  # (B, CAP, 3)
    normals: jnp.ndarray  # (B, CAP, 3)
    colors: jnp.ndarray  # (B, CAP, 3)
    features: jnp.ndarray  # (B, CAP, 1)
    num_points: jnp.ndarray  # (K, B) int32

    def to_pointclouds(self) -> Pointclouds:
        """Host-side compaction into a standard (unsharded) Pointclouds."""
        pts = np.asarray(jax.device_get(self.points))
        nrm = np.asarray(jax.device_get(self.normals))
        col = np.asarray(jax.device_get(self.colors))
        feat = np.asarray(jax.device_get(self.features))
        nums = np.asarray(jax.device_get(self.num_points))  # (K, B)
        K, B = nums.shape
        C = pts.shape[1] // K
        pts_l, nrm_l, col_l, feat_l = [], [], [], []
        for b in range(B):
            keep = np.zeros(pts.shape[1], dtype=bool)
            for k in range(K):
                keep[k * C : k * C + nums[k, b]] = True
            pts_l.append(pts[b][keep])
            nrm_l.append(nrm[b][keep])
            col_l.append(col[b][keep])
            feat_l.append(feat[b][keep])
        return Pointclouds.from_list(pts_l, normals=nrm_l, colors=col_l,
                                     features=feat_l)


class MapShardedPointFusion:
    r"""PointFusion (GT odometry) with the map's point axis sharded over a
    mesh axis — the whole frame scan runs inside one ``shard_map``-ed jit.

    Args:
        map_capacity: GLOBAL capacity; must be divisible by the mesh size.
        mesh: 1-D mesh to shard over (default: all devices, axis 'map').
        dist_th / angle_th / sigma: PointFusion parameters (reference
            pointfusion.py:53-105 defaults).
    """

    def __init__(
        self,
        *,
        map_capacity: int,
        mesh: Optional[Mesh] = None,
        axis_name: str = "map",
        dist_th: float = 0.05,
        angle_th: float = 20.0,
        sigma: float = 0.6,
        use_jit: bool = True,
    ):
        import math

        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
        self.mesh = mesh
        self.axis_name = axis_name
        self.K = int(mesh.devices.size)
        if map_capacity % self.K != 0:
            raise ValueError(
                f"map_capacity ({map_capacity}) must be divisible by the "
                f"mesh size ({self.K})."
            )
        self.map_capacity = map_capacity
        self.dist_th = dist_th
        self.dot_th = math.cos(angle_th * math.pi / 180.0)
        self.sigma = sigma
        self._forward = jax.jit(self._forward_impl) if use_jit else self._forward_impl

    # ------------------------------------------------------------------ #

    def __call__(self, frames: RGBDImages) -> Tuple[ShardedMap, jnp.ndarray]:
        return self.forward(frames)

    def forward(self, frames: RGBDImages) -> Tuple[ShardedMap, jnp.ndarray]:
        r"""Run fusion over the whole sequence; returns the sharded map and
        the (pass-through, GT) trajectory ``(B, L, 4, 4)``."""
        if frames.poses is None:
            raise ValueError("MapShardedPointFusion requires frames with poses.")
        return self._forward(frames)

    def _forward_impl(self, frames: RGBDImages):
        B, L, H, W = frames.shape
        HW = H * W
        K = self.K
        C = self.map_capacity // K
        axis = self.axis_name

        # Replicated per-frame data, precomputed once (L leading).
        fv = jnp.moveaxis(frames.global_vertex_map.reshape(B, L, HW, 3), 1, 0)
        fn = jnp.moveaxis(frames.global_normal_map.reshape(B, L, HW, 3), 1, 0)
        fc = jnp.moveaxis(frames.rgb_image.reshape(B, L, HW, 3), 1, 0)
        fa = jnp.moveaxis(
            get_alpha(frames.vertex_map, sigma=self.sigma, dim=4, keepdim=True)
            .reshape(B, L, HW, 1), 1, 0)
        fvalid = jnp.moveaxis(frames.valid_depth_mask.reshape(B, L, HW), 1, 0)
        poses = jnp.moveaxis(frames.poses, 1, 0)  # (L, B, 4, 4)
        intr = frames.intrinsics[:, 0]  # (B, 4, 4)

        dist_th, dot_th = self.dist_th, self.dot_th
        GCAP = jnp.int32(K * C)

        def sharded_scan(fv, fn, fc, fa, fvalid, poses, intr):
            shard = jax.lax.axis_index(axis)
            base = shard * C
            bidx_c = jnp.broadcast_to(jnp.arange(B)[:, None], (B, C))
            bidx_p = jnp.broadcast_to(jnp.arange(B)[:, None], (B, HW))
            lidx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], (B, C))
            pixel_ids = jnp.broadcast_to(
                jnp.arange(HW, dtype=jnp.int32)[None], (B, HW))

            def body(carry, frame):
                pts, nrm, col, feat, nloc = carry
                v, n, c, a, vd, pose = frame

                nonpad = lidx < nloc[:, None]
                valid, pix = _project_map_points(pts, nonpad, pose, intr, H, W)

                # --- gate against the frame (one packed 8-wide gather) ---
                fgeom = jnp.concatenate(
                    [v, n, a, jnp.zeros((B, HW, 1), v.dtype)], axis=-1)
                safe_pix = jnp.minimum(pix, HW - 1)
                g = jnp.take_along_axis(fgeom, safe_pix[..., None], axis=1)
                fp, fnrm = g[..., :3], g[..., 3:6]
                is_close = jnp.linalg.norm(fp - pts, axis=-1) < dist_th
                is_similar = jnp.sum(fnrm * nrm, axis=-1) > dot_th
                eligible = valid & is_close & is_similar
                ray = jnp.sum((pts - fp) ** 2, axis=-1)

                # --- local per-pixel winner via the flat 4-key sort ---
                cc = feat[..., 0]
                k_pix = jnp.where(eligible, pix, HW)
                k_negcc = jnp.where(eligible, -cc, jnp.inf)
                k_ray = jnp.where(eligible, ray, jnp.inf)
                k_idx = jnp.where(eligible, lidx, C)
                boff = jnp.arange(B, dtype=jnp.int32)[:, None] * (HW + 1)
                s_pix, s_negcc, s_ray, s_idx = jax.lax.sort(
                    ((k_pix + boff).reshape(-1), k_negcc.reshape(-1),
                     k_ray.reshape(-1), k_idx.reshape(-1)),
                    dimension=0, num_keys=4, is_stable=False)
                s_pix = s_pix.reshape(B, C) - boff
                s_negcc = s_negcc.reshape(B, C)
                s_ray = s_ray.reshape(B, C)
                s_idx = s_idx.reshape(B, C)
                first = jnp.concatenate(
                    [jnp.ones((B, 1), bool), s_pix[:, 1:] != s_pix[:, :-1]], axis=1)
                s_winner = first & (s_pix < HW)
                table_pix = jnp.where(
                    s_winner, s_pix, HW + jnp.arange(C, dtype=jnp.int32)[None])
                t_negcc = (jnp.full((B, HW), jnp.inf)
                           .at[bidx_c, table_pix]
                           .set(s_negcc, mode="drop", unique_indices=True))
                t_ray = (jnp.full((B, HW), jnp.inf)
                         .at[bidx_c, table_pix]
                         .set(s_ray, mode="drop", unique_indices=True))
                t_gidx = (jnp.full((B, HW), GCAP, dtype=jnp.int32)
                          .at[bidx_c, table_pix]
                          .set(s_idx + base, mode="drop", unique_indices=True))

                # --- cross-shard lexicographic winner reduction (ICI) ---
                a_negcc = jax.lax.all_gather(t_negcc, axis, axis=0)  # (K,B,HW)
                a_ray = jax.lax.all_gather(t_ray, axis, axis=0)
                a_gidx = jax.lax.all_gather(t_gidx, axis, axis=0)
                b_negcc, b_ray, b_gidx = a_negcc[0], a_ray[0], a_gidx[0]
                for k in range(1, K):
                    lt = (a_negcc[k] < b_negcc) | (
                        (a_negcc[k] == b_negcc)
                        & ((a_ray[k] < b_ray)
                           | ((a_ray[k] == b_ray) & (a_gidx[k] < b_gidx))))
                    b_negcc = jnp.where(lt, a_negcc[k], b_negcc)
                    b_ray = jnp.where(lt, a_ray[k], b_ray)
                    b_gidx = jnp.where(lt, a_gidx[k], b_gidx)
                corresponded = b_gidx < GCAP

                # --- destinations: local merges + round-robin appends ---
                local_win = corresponded & (b_gidx >= base) & (b_gidx < base + C)
                new_mask = vd & ~corresponded
                new_rank = jnp.cumsum(new_mask.astype(jnp.int32), axis=-1) - 1
                mine = new_mask & (new_rank % K == shard)
                tail = nloc[:, None] + new_rank // K
                oob = C + pixel_ids
                dest = jnp.where(
                    local_win, b_gidx - base,
                    jnp.where(mine & (tail < C), tail, oob))
                row_src = (jnp.full((B, C), HW, dtype=jnp.int32)
                           .at[bidx_p, dest]
                           .set(pixel_ids, mode="drop", unique_indices=True))
                touched = row_src < HW
                safe_src = jnp.where(touched, row_src, 0)

                # --- row-side merge: pull frame data to the owning rows ---
                g8 = jnp.take_along_axis(fgeom, safe_src[..., None], axis=1)
                gc = jnp.take_along_axis(c, safe_src[..., None], axis=1)
                alpha = g8[..., 6:7]
                # fresh tail rows have feat == 0 (never written), so one
                # uniform weighted-average formula covers merge AND append
                cc_old = feat
                new_cc = cc_old + alpha
                inv = 1.0 / jnp.where(new_cc == 0, 1.0, new_cc)
                t = touched[..., None]
                pts2 = jnp.where(t, (cc_old * pts + alpha * g8[..., :3]) * inv, pts)
                nrm2 = jnp.where(t, (cc_old * nrm + alpha * g8[..., 3:6]) * inv, nrm)
                col2 = jnp.where(t, (cc_old * col + alpha * gc) * inv, col)
                feat2 = jnp.where(t, new_cc, feat)
                appended = jnp.sum((mine & (tail < C)).astype(jnp.int32), axis=-1)
                return (pts2, nrm2, col2, feat2, nloc + appended), None

            zeros3 = jnp.zeros((B, C, 3), jnp.float32)
            init = (zeros3, zeros3, zeros3,
                    jnp.zeros((B, C, 1), jnp.float32),
                    jnp.zeros((B,), jnp.int32))
            # the carry varies across the mesh axis (each shard owns its own
            # slice); mark the replicated zero init accordingly
            init = jax.tree.map(
                lambda x: jax.lax.pcast(x, axis, to="varying"), init
            )
            (pts, nrm, col, feat, nloc), _ = jax.lax.scan(
                body, init, (fv, fn, fc, fa, fvalid, poses))
            return pts, nrm, col, feat, nloc[None]  # (1, B) per shard

        mesh, axis_name = self.mesh, self.axis_name
        rep = P()
        out_map = P(None, axis_name)
        fused = jax.shard_map(
            sharded_scan,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, rep, rep),
            out_specs=(out_map, out_map, out_map, out_map, P(axis_name, None)),
        )(fv, fn, fc, fa, fvalid, poses, intr)
        pts, nrm, col, feat, nums = fused
        return ShardedMap(pts, nrm, col, feat, nums), frames.poses
