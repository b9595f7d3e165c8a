r"""ICL-NUIM dataset loader (parity with
``/root/reference/gradslam/datasets/icl.py:17``).

Loads ``living_room_trajX_frei_png`` trajectories: reads ``associations.txt``
plus ``livingRoomX.gt.freiburg`` / ``*.gt.sim`` poses. Behavioural quirks kept
for parity: intrinsics fx=481.2, **fy=-480** (negative!), cx=319.5, cy=239.5
(icl.py:379-381); depth scale 1/5000 (icl.py:387); trajectory 0 drops its last
frame (missing pose, icl.py:313-315).
"""

from __future__ import annotations

import os
from typing import Optional, Union

import numpy as np

from .base import RGBDSequenceDataset, chunk_sequence
from .datautils import pointquaternion_to_homogeneous, scale_intrinsics

__all__ = ["ICL"]


def _load_sim_poses(path: str) -> np.ndarray:
    """Parse a ``.gt.sim`` file: 3x4 pose blocks, 4 lines per pose (last line
    blank), padded with [0, 0, 0, 1] (reference icl.py:535-571)."""
    with open(path) as f:
        lines = f.readlines()
    poses = []
    block = []
    for line in lines:
        vals = [float(v) for v in line.strip().split()] if line.strip() else None
        if vals:
            block.append(vals)
            if len(block) == 3:
                mat = np.asarray(block, dtype=np.float32)
                poses.append(
                    np.concatenate(
                        [mat, np.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=np.float32)]
                    )
                )
                block = []
    return np.stack(poses)


def _load_freiburg_poses(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip() and not line.startswith("#"):
                vals = [float(v) for v in line.strip().split()]
                rows.append(vals[1:8])  # drop timestamp
    return pointquaternion_to_homogeneous(np.asarray(rows, dtype=np.float32))


class ICL(RGBDSequenceDataset):
    def __init__(
        self,
        basedir: str,
        trajectories: Union[tuple, str, None] = None,
        seqlen: int = 4,
        dilation: Optional[int] = None,
        stride: Optional[int] = None,
        start: Optional[int] = None,
        end: Optional[int] = None,
        height: int = 480,
        width: int = 640,
        channels_first: bool = False,
        normalize_color: bool = False,
        return_depth: bool = True,
        return_intrinsics: bool = True,
        return_pose: bool = True,
        return_transform: bool = True,
        return_names: bool = True,
        loader: str = "cv2",
    ):
        super().__init__(
            seqlen=seqlen,
            height=height,
            width=width,
            channels_first=channels_first,
            normalize_color=normalize_color,
            return_depth=return_depth,
            return_intrinsics=return_intrinsics,
            return_pose=return_pose,
            return_transform=return_transform,
            return_names=return_names,
            loader=loader,
            depth_scale=5000.0,
        )
        basedir = os.path.normpath(basedir)
        if not os.path.isdir(basedir):
            raise ValueError(f"basedir ({basedir}) does not exist.")
        if isinstance(trajectories, str):
            if trajectories.endswith(".txt"):
                with open(trajectories) as f:
                    trajectories = tuple(
                        line.strip() for line in f if line.strip() and line[0] != "#"
                    )
            else:
                trajectories = (trajectories,)
        if trajectories is None:
            trajectories = tuple(
                d
                for d in sorted(os.listdir(basedir))
                if os.path.isdir(os.path.join(basedir, d))
            )
        if len(trajectories) == 0:
            raise ValueError(f"No trajectories found in basedir ({basedir}).")

        # ICL intrinsics — note the NEGATIVE fy (icl.py:379-381).
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 481.2, -480.0, 319.5, 239.5
        self._intrinsics = scale_intrinsics(K, height / 480.0, width / 640.0)

        for traj in trajectories:
            trajdir = os.path.join(basedir, traj)
            assoc_path = os.path.join(trajdir, "associations.txt")
            if not os.path.isfile(assoc_path):
                raise ValueError(f"Missing associations.txt in {trajdir}.")
            depth_rel, color_rel = [], []
            with open(assoc_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    fields = line.strip().split()
                    # format: depth_t depth_path rgb_t rgb_path
                    depth_rel.append(fields[1])
                    color_rel.append(fields[3])

            pose_file = None
            for fname in sorted(os.listdir(trajdir)):
                if fname.endswith(".gt.freiburg"):
                    pose_file = os.path.join(trajdir, fname)
                    fmt = "freiburg"
                    break
                if fname.endswith(".gt.sim"):
                    pose_file = os.path.join(trajdir, fname)
                    fmt = "sim"
            if pose_file is None:
                raise ValueError(f"No groundtruth pose file found in {trajdir}.")
            poses = (
                _load_freiburg_poses(pose_file)
                if fmt == "freiburg"
                else _load_sim_poses(pose_file)
            )

            n = min(len(color_rel), len(poses))  # traj0 drops last frame
            color_paths = [os.path.join(trajdir, p) for p in color_rel[:n]]
            depth_paths = [os.path.join(trajdir, p) for p in depth_rel[:n]]

            for chunk in chunk_sequence(n, seqlen, dilation, stride, start, end):
                self.samples.append(
                    dict(
                        color_paths=[color_paths[i] for i in chunk],
                        depth_paths=[depth_paths[i] for i in chunk],
                        poses=[poses[i] for i in chunk],
                        name=traj,
                    )
                )

    def intrinsics_for(self, idx: int) -> np.ndarray:
        """Fixed ICL pinhole intrinsics (4x4, fy negative — reference quirk
        icl.py:379-381), pre-scaled to the target resolution."""
        return self._intrinsics
