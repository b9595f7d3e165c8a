"""Headline benchmark: PointFusion + GT odometry, 640x480 RGB-D, 30 frames.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

vs_baseline compares against the reference's measured CPU fps on the same
synthetic workload (MEASURED_BASELINE.json, produced by
scripts/measure_baseline.py — the reference publishes no numbers, SURVEY §6).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_frames_arrays
    from gradslam_tpu import PointFusion, RGBDImages

    B, L, H, W = 1, 30, 480, 640
    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    # Full worst-case capacity (the reference's map reaches 5.6M points on
    # this noisy synthetic clip — see MEASURED_BASELINE.json), so use L*H*W
    # to keep the workload semantics identical.
    slam = PointFusion(odom="gt", map_capacity=L * H * W)

    # compile + warmup
    pc, out_poses = slam(frames)
    jax.block_until_ready((pc.points, out_poses))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        pc, out_poses = slam(frames)
        jax.block_until_ready((pc.points, out_poses))
    dt = (time.perf_counter() - t0) / iters

    fps = (B * L) / dt
    baseline_path = os.path.join(os.path.dirname(__file__), "MEASURED_BASELINE.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        if ref.get("reference_fps"):
            vs_baseline = fps / ref["reference_fps"]
    print(
        json.dumps(
            {
                "metric": "PointFusion(gt) 640x480 RGB-D frames/s/chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
