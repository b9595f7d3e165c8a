"""Long-horizon tracked parity vs the reference (VERDICT r2 #3).

SURVEY hard-part #4: LM/gradLM numerical drift (fp32, solve-vs-inverse
differences) compounds over numiters iterations x L frames, so parity must be
defined at the ATE level over a LONG sequence, not per-op or on a 3-frame
clip. This script runs the reference PointFusion (torch CPU, via
scripts/reference_shim.py) and our TPU-native pipeline side-by-side on a
30+ frame synthetic clip with identical solver parameters
(reference loop: /root/reference/gradslam/slam/icpslam.py:125-137), then
prints the divergence-vs-frame-count curve and inter-implementation ATE.

Usage:  python scripts/longhorizon_parity.py [--frames 30] [--odom gradicp]
        [--height 120 --width 160] [--speed 2.0] [--save-goldens]

--save-goldens writes the reference trajectory to
tests/data/goldens/longhorizon_<odom>_poses.npy for the slow CI parity test
(tests/slam/test_longhorizon_parity.py), plus the clip parameters alongside.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(__file__))

def run_reference(rgb, depths, intrinsics, poses, odom, dsratio, numiters):
    import reference_shim

    reference_shim.load_reference()
    import torch
    from gradslam.slam.pointfusion import PointFusion
    from gradslam.structures.rgbdimages import RGBDImages

    frames = RGBDImages(
        torch.from_numpy(rgb), torch.from_numpy(depths),
        torch.from_numpy(intrinsics), torch.from_numpy(poses),
        channels_first=False,
    )
    slam = PointFusion(odom=odom, dsratio=dsratio, numiters=numiters)
    t0 = time.perf_counter()
    with torch.no_grad():
        pc, out_poses = slam(frames)
    dt = time.perf_counter() - t0
    return out_poses[0].numpy(), [p.shape[0] for p in pc.points_list], dt


def run_ours(rgb, depths, intrinsics, poses, odom, dsratio, numiters):
    import jax.numpy as jnp

    from gradslam_tpu import PointFusion, RGBDImages

    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    L, H, W = rgb.shape[1:4]
    slam = PointFusion(odom=odom, dsratio=dsratio, numiters=numiters,
                       map_capacity=L * H * W)
    t0 = time.perf_counter()
    pc, out_poses = slam(frames)
    out = np.asarray(out_poses[0])
    dt = time.perf_counter() - t0
    return out, [int(n) for n in np.asarray(pc.num_points)], dt


def divergence_report(ref_traj, jax_traj, gt):
    """Per-frame translation divergence + rotation angle between the two
    implementations, and each one's ATE against ground truth."""
    t_err = np.linalg.norm(ref_traj[:, :3, 3] - jax_traj[:, :3, 3], axis=-1)
    # rotation geodesic angle between implementations
    R = np.einsum("lij,lkj->lik", ref_traj[:, :3, :3], jax_traj[:, :3, :3])
    cos = np.clip((np.trace(R, axis1=1, axis2=2) - 1) / 2, -1, 1)
    r_err = np.degrees(np.arccos(cos))

    def ate(traj):
        e = traj[:, :3, 3] - gt[:, :3, 3]
        return float(np.sqrt((e**2).sum(-1).mean()))

    return t_err, r_err, ate(ref_traj), ate(jax_traj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--speed", type=float, default=2.0)
    ap.add_argument("--odom", default="gradicp", choices=["icp", "gradicp"])
    ap.add_argument("--dsratio", type=int, default=4)
    ap.add_argument("--numiters", type=int, default=10)
    ap.add_argument("--save-goldens", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from gradslam_tpu.datasets import synthetic_sequence

    rgb, depths, intrinsics, poses = synthetic_sequence(
        1, args.frames, args.height, args.width, seed=0, speed=args.speed
    )

    ref_traj, ref_counts, ref_dt = run_reference(
        rgb, depths, intrinsics, poses, args.odom, args.dsratio, args.numiters
    )
    print(f"reference: {ref_dt:.1f}s, map {ref_counts}", file=sys.stderr)
    jax_traj, jax_counts, jax_dt = run_ours(
        rgb, depths, intrinsics, poses, args.odom, args.dsratio, args.numiters
    )
    print(f"ours:      {jax_dt:.1f}s, map {jax_counts}", file=sys.stderr)

    t_err, r_err, ate_ref, ate_jax = divergence_report(
        ref_traj, jax_traj, poses[0]
    )
    inter_ate = float(np.sqrt((t_err**2).mean()))
    print("frame  |t_ref - t_ours| (mm)   rot divergence (deg)")
    for s in range(args.frames):
        print(f"{s:5d}  {t_err[s]*1000:12.4f}        {r_err[s]:12.6f}")
    print(json.dumps({
        "config": f"PointFusion({args.odom}) {args.width}x{args.height} "
                  f"L={args.frames} speed={args.speed} "
                  f"dsratio={args.dsratio} numiters={args.numiters}",
        "inter_impl_ate_m": inter_ate,
        "max_translation_divergence_m": float(t_err.max()),
        "ate_reference_m": ate_ref,
        "ate_ours_m": ate_jax,
        "map_points_reference": ref_counts,
        "map_points_ours": jax_counts,
    }, indent=1))

    if args.save_goldens:
        gdir = os.path.join(REPO, "tests", "data", "goldens")
        os.makedirs(gdir, exist_ok=True)
        np.save(os.path.join(gdir, f"longhorizon_{args.odom}_poses.npy"),
                ref_traj)
        meta = {
            "frames": args.frames, "height": args.height,
            "width": args.width, "speed": args.speed, "seed": 0,
            "odom": args.odom, "dsratio": args.dsratio,
            "numiters": args.numiters,
            "map_points_reference": ref_counts,
            "generator": "scripts/longhorizon_parity.py",
        }
        with open(os.path.join(gdir, f"longhorizon_{args.odom}_meta.json"),
                  "w") as f:
            json.dump(meta, f, indent=1)
            f.write("\n")
        print(f"# goldens written to {gdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
