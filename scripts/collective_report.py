"""Collective-volume report for the map-axis-sharded pipeline (VERDICT r1 #7).

Lowers ``MapShardedPointFusion`` on a virtual K-device CPU mesh and extracts
every ``all_gather`` from the StableHLO, reporting bytes moved per frame as a
function of (H, W, K, CAP). The key scaling property asserted by
tests/parallel/test_map_sharded.py::TestCollectiveVolume — and visible here —
is that the per-frame collective volume is O(K * B * H * W) (winner tables)
plus O(K * B * window) for tracked odometry, and INDEPENDENT of map capacity:
the map never moves over the interconnect, only frame-sized tables do.

Usage: python scripts/collective_report.py [--markdown]
"""

import argparse
import os
import re
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

DTYPE_BYTES = {"f32": 4, "i32": 4, "f64": 8, "i64": 8, "i1": 1, "f16": 2,
               "bf16": 2}


def collective_volume(fn, *args):
    """all_gather and all_reduce (psum) OUTPUT bytes in one trace of ``fn``
    (per scan iteration — collectives inside lax.scan appear once in the
    HLO). Returns ``(gather_bytes, gather_ops, reduce_bytes, reduce_ops)``."""
    import jax

    txt = jax.jit(fn).lower(*args).as_text()

    def scan_ops(opname, flags=0):
        total = 0
        ops = []
        # matches the op's trailing function type `... -> tensor<AxBx..xDT>`;
        # all_reduce carries a multi-line reduction REGION before it, so its
        # scan needs DOTALL (lazy matching stops at the op's own signature)
        for shape in re.findall(
            opname + r".*?\)\s*->\s*tensor<([0-9a-z_]+)>", txt, flags
        ):
            parts = shape.split("x")
            dt = parts[-1]
            n = 1
            for d in parts[:-1]:
                n *= int(d)
            nbytes = n * DTYPE_BYTES.get(dt, 4)
            ops.append((shape, dt, nbytes))
            total += nbytes
        return total, ops

    g_total, g_ops = scan_ops("all_gather")
    r_total, r_ops = scan_ops("all_reduce", re.DOTALL)
    return g_total, g_ops, r_total, r_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    # Self-bootstrap an 8-device CPU mesh. setdefault on XLA_FLAGS is NOT
    # enough: a pre-set XLA_FLAGS (common on TPU hosts) would leave 1 CPU
    # device and the report would silently measure a 1-device mesh while
    # labeling rows K=8. _bootstrap_devices rewrites a too-small count and
    # forces the CPU platform via the config API.
    from __graft_entry__ import _bootstrap_devices

    devices = _bootstrap_devices(8)
    import jax

    assert len(devices) >= 8, f"CPU bootstrap produced {len(devices)} devices"
    import jax.numpy as jnp

    from gradslam_tpu import RGBDImages
    from gradslam_tpu.datasets import synthetic_sequence
    from gradslam_tpu.parallel import MapShardedPointFusion, make_mesh

    import numpy as np
    from jax.sharding import Mesh

    rows = []
    for dp, K, H, W, cap_mult, odom, assoc in [
        (1, 8, 16, 24, 2, "gt", "knn"),
        (1, 8, 16, 24, 16, "gt", "knn"),  # 8x capacity — volume must not change
        (1, 4, 16, 24, 2, "gt", "knn"),
        (1, 8, 24, 32, 2, "gt", "knn"),
        (1, 8, 16, 24, 2, "gradicp", "knn"),
        # projective odometry: the window all_gather disappears; what
        # remains is the fusion winner tables + ~230 B of psum-folded
        # normal equations per solver iteration (docs/design.md §6)
        (1, 8, 16, 24, 2, "gradicp", "projective"),
        # 2-D dp x map mesh at the same per-device load as the K=4 row:
        # fusion is independent per batch element, so the collective count
        # and per-device bytes must MATCH the 1-D row exactly (the batch
        # axis adds zero communication by construction; docs/design.md §6).
        (2, 4, 16, 24, 2, "gt", "knn"),
        (2, 4, 16, 24, 2, "gradicp", "knn"),
    ]:
        B, L = dp, 2
        cap = K * 128 * cap_mult
        if dp == 1:
            mesh = make_mesh(devices[:K], axis_name="map")
            mesh_kw = dict(mesh=mesh)
        else:
            mesh = Mesh(
                np.asarray(devices[: dp * K]).reshape(dp, K), ("dp", "map")
            )
            mesh_kw = dict(mesh=mesh, batch_axis="dp")
        rgb, depth, intr, poses = synthetic_sequence(B, L, H, W)
        fr = RGBDImages(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(intr),
            jnp.asarray(poses),
        )
        kw = dict(dsratio=2, numiters=2) if odom != "gt" else {}
        if assoc == "projective":
            kw["odom_assoc"] = "projective"
        msf = MapShardedPointFusion(map_capacity=cap, odom=odom, **mesh_kw,
                                    **kw)
        g_total, g_ops, r_total, r_ops = collective_volume(
            msf._forward_impl, fr)
        label = odom if assoc == "knn" else f"{odom}+proj"
        rows.append((dp, K, H, W, cap, label, len(g_ops), g_total,
                     len(r_ops), r_total))

    # The HLO contains TWO fusion sites (the frame-0 bootstrap and the scan
    # body), so the per-frame volume is half the gt-mode total; tracked
    # odometry adds its window gather inside the scan body only.
    if args.markdown:
        print("| mesh | HxW | capacity | odom | all_gathers (trace) | bytes gathered | all_reduces | bytes reduced |")
        print("|---|---|---|---|---|---|---|---|")
        for dp, K, H, W, cap, odom, n, total, rn, rtotal in rows:
            m = f"{K}" if dp == 1 else f"{dp}x{K} (dp x map)"
            print(f"| {m} | {H}x{W} | {cap} | {odom} | {n} | {total:,} "
                  f"| {rn} | {rtotal:,} |")
    else:
        for dp, K, H, W, cap, odom, n, total, rn, rtotal in rows:
            m = f"K={K}" if dp == 1 else f"dp={dp} K={K}"
            print(
                f"{m} HxW={H}x{W} cap={cap} odom={odom}: "
                f"{n} all_gathers, {total:,} bytes; "
                f"{rn} all_reduces, {rtotal:,} bytes in trace"
            )


if __name__ == "__main__":
    main()
