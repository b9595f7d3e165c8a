r"""PointFusion example (parity with ``/root/reference/examples/pointfusion.py``):
load a batch of short sequences from TUM or ICL, run PointFusion, and
optionally visualize the fused map with open3d.

Also supports config-file driving via ``--config`` (CfgNode — wired in, unlike
the reference where the config system is dead code).
"""

import argparse

import jax.numpy as jnp
import numpy as np

from gradslam_tpu import PointFusion, RGBDImages
from gradslam_tpu.config import CfgNode
from gradslam_tpu.datasets import ICL, TUM
from gradslam_tpu.utils import parse_pyramid

parser = argparse.ArgumentParser()
parser.add_argument(
    "--dataset", type=str, required=True, choices=["tum", "icl"],
    help="Dataset to use.",
)
parser.add_argument(
    "--dataset_path", type=str, required=True, help="Path to the dataset directory."
)
parser.add_argument(
    "--odometry", type=str, default="gradicp", choices=["gt", "icp", "gradicp"],
    help="Odometry method to use.",
)
parser.add_argument("--sequences", type=str, default=None)
parser.add_argument("--seqlen", type=int, default=10)
parser.add_argument("--batch_size", type=int, default=2)
parser.add_argument("--height", type=int, default=120)
parser.add_argument("--width", type=int, default=160)
parser.add_argument("--config", type=str, default=None, help="Optional YAML config.")
parser.add_argument(
    "--quantize-colors", action="store_true",
    help="Production fast path: 8-bit colors packed into the map row "
    "(+36%% fps at 640x480; geometry/trajectory identical).",
)
parser.add_argument(
    "--pyramid", type=str, default=None,
    help="Coarse-to-fine odometry schedule 'ds:iters,ds:iters,...' "
    "(e.g. '8:6,4:4'); coarser levels warm-start finer ones.",
)
parser.add_argument(
    "--robust-loss", type=str, default=None, choices=["huber", "tukey"],
    help="Robust ICP kernel (IRLS). On noisy/outlier-heavy clips the "
    "combination --robust-loss tukey --motion-model constant_velocity "
    "--robust-scale 0.03 --dist-thresh 0.01 cuts tracked ATE ~18x vs "
    "plain least-squares (see tests/slam/test_hard_clip.py).",
)
parser.add_argument("--robust-scale", type=float, default=0.05)
parser.add_argument(
    "--dist-thresh", type=float, default=None,
    help="Squared-distance gate on ICP associations (e.g. 0.01 = 10 cm); "
    "pairs well with a tight --robust-scale on outlier-heavy clips.",
)
parser.add_argument(
    "--motion-model", type=str, default="static",
    choices=["static", "constant_velocity"],
    help="Odometry initialization across frames.",
)
parser.add_argument(
    "--normal-pitch", type=int, default=None,
    help="Finite-difference baseline (pixels) for normal maps. Depth-noise "
    "normal error doubles every time resolution doubles at the reference's "
    "pitch 1; scale the pitch with resolution (~W/160) on noisy sensors "
    "(measured: rescues 320x240 tracking under 5 mm noise, 0.34 m -> 18 mm "
    "ATE). Default: reference-parity pitch 1.",
)
parser.add_argument(
    "--odom-assoc", type=str, default="knn",
    help="Odometry data association: 'knn' (reference semantics, O(N*M) "
    "nearest-neighbour per iteration) or 'projective' (KNN-free "
    "frame-to-model: project the map window into the live camera and read "
    "the frame at the landed pixel — O(N) per iteration). With --pyramid, "
    "a comma-separated per-level list enables hybrid schedules, e.g. "
    "--pyramid 8:6,8:4 --odom-assoc projective,knn (cheap projective "
    "pre-alignment + a short KNN re-anchor level).",
)
parser.add_argument(
    "--prune-every", type=int, default=0,
    help="Keller-style map maintenance: every N mapped frames, drop "
    "points whose confidence is below --prune-min-confidence. On noisy "
    "full-resolution clips this both bounds the map and improves "
    "tracking (640x480 hard clip: 30.1 -> 17.0 mm ATE with N=4, "
    "conf 1.5 — docs/tutorial_odometry.md). 0 = off.",
)
parser.add_argument("--prune-min-confidence", type=float, default=1.5)
parser.add_argument(
    "--odom-angle-gate", type=float, default=None,
    help="Normal-compatibility gate (degrees), both association modes: "
    "rejects wrong-surface associations a pure distance gate admits "
    "(~60 is a good default on noisy depth).",
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
parser.add_argument(
    "--relocalize-below", type=float, default=0.0,
    help="In-scan failure branch: when the per-frame tracking-health "
    "inlier fraction drops below this, a multi-hypothesis relocalization "
    "runs inside the compiled forward (0 = off; 0.2-0.5 useful).",
)
parser.add_argument(
    "--anchor-every", type=int, default=0,
    help="freeze a keyframe anchor every N frames and auto-recover "
    "slow drift against it in-scan (requires --relocalize-below; "
    "0 = off)")
parser.add_argument("--visualize", action="store_true")
args = parser.parse_args()




def main():
    from gradslam_tpu.utils import enable_compile_cache

    # persistent XLA compile cache: re-runs skip the minutes-long
    # 640x480 fused-SLAM compile (VERDICT r3 #3)
    enable_compile_cache()
    cfg = CfgNode(
        {
            "odometry": args.odometry,
            "seqlen": args.seqlen,
            "height": args.height,
            "width": args.width,
        }
    )
    if args.config:
        cfg.merge_from_file(args.config)

    # The quantized map layout packs colors assuming [0, 1] (pack_colors);
    # 0-255 dataset floats would clip every channel to white.
    norm = dict(normalize_color=True) if args.quantize_colors else {}
    if args.dataset == "tum":
        dataset = TUM(
            args.dataset_path, sequences=args.sequences, seqlen=cfg.seqlen,
            height=cfg.height, width=cfg.width, **norm,
        )
    else:
        dataset = ICL(
            args.dataset_path, trajectories=args.sequences, seqlen=cfg.seqlen,
            height=cfg.height, width=cfg.width, **norm,
        )

    samples = [dataset[i] for i in range(min(args.batch_size, len(dataset)))]
    colors = jnp.asarray(np.stack([s[0] for s in samples]))
    depths = jnp.asarray(np.stack([s[1] for s in samples]))
    intrinsics = jnp.asarray(np.stack([s[2][None] for s in samples]))
    poses = jnp.asarray(np.stack([s[3] for s in samples]))

    frames = RGBDImages(colors, depths, intrinsics, poses)
    slam = PointFusion(
        odom=cfg.odometry,
        quantize_colors=args.quantize_colors,
        pyramid=parse_pyramid(args.pyramid),
        robust_loss=args.robust_loss,
        robust_scale=args.robust_scale,
        dist_thresh=args.dist_thresh,
        motion_model=args.motion_model,
        normal_pitch=args.normal_pitch,
        odom_assoc=(args.odom_assoc.split(",") if "," in args.odom_assoc
                    else args.odom_assoc),
        odom_sym_normals=args.odom_sym_normals,
        odom_point_weight=args.odom_point_weight,
        odom_subpixel=args.odom_subpixel,
        odom_angle_gate=args.odom_angle_gate,
        relocalize_below=args.relocalize_below,
        anchor_every=args.anchor_every,
        prune_every=args.prune_every,
        prune_min_confidence=args.prune_min_confidence,
    )
    pointclouds, recovered_poses = slam(frames)
    if args.quantize_colors:
        pointclouds = PointFusion.decode_map(pointclouds)
    print("map points per sequence:", np.asarray(pointclouds.num_points))
    print("recovered poses shape:", recovered_poses.shape)
    dropped = int(np.asarray(pointclouds.num_dropped).sum())
    if dropped:
        print(f"WARNING: map overflowed — {dropped} points dropped "
              "(raise map_capacity)")

    if args.visualize:
        import open3d as o3d

        o3d.visualization.draw_geometries([pointclouds.open3d(0)])


if __name__ == "__main__":
    main()
