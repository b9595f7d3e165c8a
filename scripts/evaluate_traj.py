"""TUM-benchmark-style trajectory evaluation CLI.

The TUM RGB-D benchmark ships ``evaluate_ate.py`` / ``evaluate_rpe.py`` tools
that the reference points users at (reference gradslam/datasets/tumutils.py:35-37
vendors only their association helpers). This CLI is the equivalent for this
framework: it reads two TUM-format trajectory files (groundtruth + estimate),
associates them by timestamp, and reports ATE-RMSE (after Umeyama alignment)
and RPE statistics from :mod:`gradslam_tpu.metrics`.

Usage:
    python scripts/evaluate_traj.py groundtruth.txt estimate.txt \
        [--max-difference 0.02] [--offset 0.0] [--delta 1] [--no-align] [--json]
"""

import argparse
import json
import sys

import numpy as np


def evaluate(
    gt_file: str,
    est_file: str,
    max_difference: float = 0.02,
    offset: float = 0.0,
    delta: int = 1,
    align: bool = True,
):
    """Returns a dict of trajectory-error statistics for two TUM files."""
    # Trajectory evaluation is a few thousand FLOPs of host-side math — never
    # worth grabbing an accelerator (on tunneled-TPU setups, backend init
    # would dominate or hang the CLI).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. called from a live session)

    from gradslam_tpu.datasets.tumutils import associate
    from gradslam_tpu.metrics import ate_rmse, rpe
    from gradslam_tpu.utils.trajectory_io import load_trajectory_tum

    gt_stamps, gt_poses = load_trajectory_tum(gt_file)
    est_stamps, est_poses = load_trajectory_tum(est_file)
    gt_by_stamp = {float(s): i for i, s in enumerate(gt_stamps)}
    est_by_stamp = {float(s): i for i, s in enumerate(est_stamps)}
    matches = associate(gt_by_stamp, est_by_stamp, offset, max_difference)
    if len(matches) < 2:
        raise ValueError(
            f"Only {len(matches)} timestamp matches between {gt_file} and "
            f"{est_file} (max_difference={max_difference}); cannot evaluate."
        )
    gt_idx = [gt_by_stamp[a] for a, _ in matches]
    est_idx = [est_by_stamp[b] for _, b in matches]
    gt_m = gt_poses[gt_idx]
    est_m = est_poses[est_idx]

    ate = float(ate_rmse(est_m, gt_m, align=align))
    trans_err, rot_err = rpe(est_m, gt_m, delta=delta, reduce=False)
    trans_err = np.asarray(trans_err)
    rot_err = np.asarray(rot_err)
    return {
        "pairs": len(matches),
        "ate_rmse_m": ate,
        "rpe_delta": delta,
        "rpe_trans_rmse_m": float(np.sqrt(np.mean(trans_err**2))),
        "rpe_trans_mean_m": float(trans_err.mean()),
        "rpe_trans_median_m": float(np.median(trans_err)),
        "rpe_trans_max_m": float(trans_err.max()),
        "rpe_rot_rmse_deg": float(np.degrees(np.sqrt(np.mean(rot_err**2)))),
        "rpe_rot_mean_deg": float(np.degrees(rot_err.mean())),
        "aligned": bool(align),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("groundtruth", help="TUM-format groundtruth trajectory")
    parser.add_argument("estimate", help="TUM-format estimated trajectory")
    parser.add_argument(
        "--max-difference", type=float, default=0.02,
        help="max timestamp difference for association (s)",
    )
    parser.add_argument(
        "--offset", type=float, default=0.0,
        help="timestamp offset added to the estimate's stamps (s)",
    )
    parser.add_argument(
        "--delta", type=int, default=1, help="RPE frame delta"
    )
    parser.add_argument(
        "--no-align", action="store_true",
        help="skip Umeyama alignment before ATE",
    )
    parser.add_argument(
        "--json", action="store_true", help="print one JSON line instead"
    )
    args = parser.parse_args(argv)

    stats = evaluate(
        args.groundtruth,
        args.estimate,
        max_difference=args.max_difference,
        offset=args.offset,
        delta=args.delta,
        align=not args.no_align,
    )
    if args.json:
        print(json.dumps(stats))
    else:
        print(f"compared_pose_pairs {stats['pairs']} pairs")
        print(f"absolute_translational_error.rmse {stats['ate_rmse_m']:.6f} m")
        print(
            f"relative_translational_error.rmse "
            f"{stats['rpe_trans_rmse_m']:.6f} m (delta={stats['rpe_delta']})"
        )
        print(f"relative_translational_error.mean {stats['rpe_trans_mean_m']:.6f} m")
        print(f"relative_translational_error.median {stats['rpe_trans_median_m']:.6f} m")
        print(f"relative_translational_error.max {stats['rpe_trans_max_m']:.6f} m")
        print(f"relative_rotational_error.rmse {stats['rpe_rot_rmse_deg']:.6f} deg")
        print(f"relative_rotational_error.mean {stats['rpe_rot_mean_deg']:.6f} deg")
    return stats


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
