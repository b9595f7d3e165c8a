"""Measure the reference's CPU throughput on the headline benchmark config
(BASELINE.md #1 extended to 640x480: PointFusion + GT odometry, 30 frames).

The reference publishes no numbers (SURVEY §6), so the baseline must be
measured. Writes MEASURED_BASELINE.json at the repo root; bench.py reads it to
compute vs_baseline.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import reference_shim  # noqa: E402

reference_shim.load_reference()

import torch  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from __graft_entry__ import _synthetic_frames_arrays  # noqa: E402


def measure(B=1, L=30, H=480, W=640, warmup_frames=2):
    from gradslam.slam.pointfusion import PointFusion
    from gradslam.structures.rgbdimages import RGBDImages

    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    frames = RGBDImages(
        torch.from_numpy(rgb),
        torch.from_numpy(depths),
        torch.from_numpy(intrinsics),
        torch.from_numpy(poses),
        channels_first=False,
    )
    slam = PointFusion(odom="gt")
    with torch.no_grad():
        # warmup on a short prefix
        slam(frames[:, :warmup_frames])
        t0 = time.perf_counter()
        pc, out_poses = slam(frames)
        dt = time.perf_counter() - t0
    fps = (B * L) / dt
    return fps, dt, [p.shape[0] for p in pc.points_list]


def measure_tracked_640(B=1, L=30, H=480, W=640, dsratio=4, numiters=10,
                        warmup_frames=2):
    """BASELINE.md config #3: PointFusion + GradICP at full 640x480 (reference
    entry point: /root/reference/examples/pointfusion.py:40-61 with
    odometry=gradicp). Uses dsratio=4 / numiters=10 to match the solver work
    of the existing 320x240 tracked baselines (MEASURED_BASELINE.json
    "tracked_baselines") — the TPU side is benchmarked with identical solver
    parameters. Also records the recovered trajectory's ATE vs ground truth
    so the baseline carries accuracy, not just speed."""
    from gradslam.slam.pointfusion import PointFusion
    from gradslam.structures.rgbdimages import RGBDImages

    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    frames = RGBDImages(
        torch.from_numpy(rgb),
        torch.from_numpy(depths),
        torch.from_numpy(intrinsics),
        torch.from_numpy(poses),
        channels_first=False,
    )
    slam = PointFusion(odom="gradicp", dsratio=dsratio, numiters=numiters)
    with torch.no_grad():
        slam(frames[:, :warmup_frames])
        t0 = time.perf_counter()
        pc, out_poses = slam(frames)
        dt = time.perf_counter() - t0
    fps = (B * L) / dt
    traj = out_poses[0].numpy()  # (L, 4, 4)
    gt = poses[0]
    err = traj[:, :3, 3] - gt[:, :3, 3]
    ate = float(np.sqrt((err**2).sum(-1).mean()))
    return fps, dt, [p.shape[0] for p in pc.points_list], ate


def measure_hard_clip(B=1, L=30, H=120, W=160, dsratio=4, numiters=10,
                      warmup_frames=2):
    """Hard accuracy clip (gradslam_tpu.datasets.hard_sequence: 6 cm/frame
    accelerating camera, 5 mm depth noise, outlier patches) through the
    REFERENCE pipeline — plain least squares, the only solver it has
    (VERDICT r3 #8). Anchors the accuracy-vs-throughput story: does the
    reference's tracking also blow up on this clip? Records fps AND ATE."""
    from gradslam.slam.pointfusion import PointFusion
    from gradslam.structures.rgbdimages import RGBDImages

    from gradslam_tpu.datasets import hard_sequence

    rgb, depths, intrinsics, poses = hard_sequence(B, L, H, W)
    frames = RGBDImages(
        torch.from_numpy(rgb),
        torch.from_numpy(depths),
        torch.from_numpy(intrinsics),
        torch.from_numpy(poses),
        channels_first=False,
    )
    slam = PointFusion(odom="gradicp", dsratio=dsratio, numiters=numiters)
    with torch.no_grad():
        slam(frames[:, :warmup_frames])
        t0 = time.perf_counter()
        pc, out_poses = slam(frames)
        dt = time.perf_counter() - t0
    fps = (B * L) / dt
    traj = out_poses[0].numpy()
    err = traj[:, :3, 3] - poses[0][:, :3, 3]
    ate = float(np.sqrt((err**2).sum(-1).mean()))
    return fps, dt, [p.shape[0] for p in pc.points_list], ate


def measure_large_map(B=1, L=60, H=480, W=640, speed=4.0, warmup_frames=2):
    """BASELINE.md config #4 analogue: long sequence, fast camera — the map
    grows into the millions of points (reference entry point:
    /root/reference/examples/pointfusion_scannet.py:39-69; no ScanNet data in
    this environment, so the same procedural scene at 4x camera speed)."""
    from gradslam.slam.pointfusion import PointFusion
    from gradslam.structures.rgbdimages import RGBDImages

    from gradslam_tpu.datasets import synthetic_sequence

    rgb, depths, intrinsics, poses = synthetic_sequence(B, L, H, W, speed=speed)
    frames = RGBDImages(
        torch.from_numpy(rgb),
        torch.from_numpy(depths),
        torch.from_numpy(intrinsics),
        torch.from_numpy(poses),
        channels_first=False,
    )
    slam = PointFusion(odom="gt")
    with torch.no_grad():
        slam(frames[:, :warmup_frames])
        t0 = time.perf_counter()
        pc, out_poses = slam(frames)
        dt = time.perf_counter() - t0
    fps = (B * L) / dt
    return fps, dt, [p.shape[0] for p in pc.points_list]


if __name__ == "__main__":
    # Merge into the existing MEASURED_BASELINE.json (other entries — e.g.
    # tracked_baselines — are measured by other invocations/scripts).
    out = os.path.join(os.path.dirname(__file__), "..", "MEASURED_BASELINE.json")
    result = {}
    if os.path.exists(out):
        with open(out) as f:
            result = json.load(f)

    if "--tracked-640" in sys.argv:
        tfps, tdt, tcounts, tate = measure_tracked_640()
        result.setdefault("tracked_baselines", {})[
            "pointfusion_gradicp_640x480_fps"
        ] = tfps
        result["tracked_baselines"]["pointfusion_gradicp_640x480"] = {
            "config": (
                "PointFusion + GradICP, 30 frames synthetic 640x480, batch 1, "
                "dsratio=4, numiters=10 (BASELINE.md #3)"
            ),
            "reference_fps": tfps,
            "wall_s": tdt,
            "map_counts": tcounts,
            "ate_m": tate,
        }
    elif "--hard-clip" in sys.argv:
        hfps, hdt, hcounts, hate = measure_hard_clip()
        result["hard_clip_baseline"] = {
            "config": (
                "PointFusion + GradICP (plain LS — all the reference has), "
                "30 frames hard clip 160x120, batch 1, dsratio=4, "
                "numiters=10"
            ),
            "reference_fps": hfps,
            "wall_s": hdt,
            "map_counts": hcounts,
            "ate_m": hate,
        }
    elif "--hard-clip-320" in sys.argv:
        # 320x240 anchor for the hard-clip bench rows (VERDICT r4 #8): the
        # same reference pipeline at the resolution where this framework's
        # normal_pitch/projective configs are benched, so those rows carry
        # vs_baseline instead of None.
        hfps, hdt, hcounts, hate = measure_hard_clip(H=240, W=320)
        result["hard_clip_baseline_320x240"] = {
            "config": (
                "PointFusion + GradICP (plain LS — all the reference has), "
                "30 frames hard clip 320x240, batch 1, dsratio=4, "
                "numiters=10"
            ),
            "reference_fps": hfps,
            "wall_s": hdt,
            "map_counts": hcounts,
            "ate_m": hate,
        }
    elif "--large-map" in sys.argv:
        lfps, ldt, lcounts = measure_large_map()
        result["large_map_baseline"] = {
            "config": (
                "PointFusion + GT odometry, 60 frames synthetic 640x480 at "
                "4x camera speed (large-map config, BASELINE.md #4)"
            ),
            "reference_fps": lfps,
            "wall_s": ldt,
            "map_counts": lcounts,
        }
    else:
        fps, dt, counts = measure()
        result.update(
            {
                "config": (
                    "PointFusion + GT odometry, 30 frames synthetic 640x480, "
                    "batch 1"
                ),
                "hardware": "CPU (reference torch, chamferdist/kornia shimmed)",
                "reference_fps": fps,
                "wall_s": dt,
                "map_counts": counts,
            }
        )
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
