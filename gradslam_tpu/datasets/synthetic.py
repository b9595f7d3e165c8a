r"""Synthetic RGB-D sequences (no reference equivalent).

A procedurally rendered static scene — a gently wavy wall observed by a
slowly translating camera with mm-scale sensor noise — geometrically
consistent across frames so projective data association behaves as on real
TUM clips. Used by the benchmark harness; useful anywhere real data isn't
available (CI, smoke tests, demos).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

from .base import RGBDSequenceDataset

__all__ = ["SyntheticRGBD", "hard_sequence", "synthetic_sequence"]


@lru_cache(maxsize=8)
def _pixel_grids(H, W):
    return np.meshgrid(np.arange(H), np.arange(W), indexing="ij")


def _render_depth(H, W, fx, cx, cy, tx, tz):
    # Solve z_c s.t. the camera ray hits the world surface
    # z_w(x_w, y_w) = 1.5 + 0.05 sin(x_w / 0.2) + 0.04 cos(y_w / 0.15)
    # with the camera at (tx, 0, tz); fixed-point iteration suffices for
    # this gentle relief. Shared by the easy and hard clip generators so
    # the two scenes stay geometrically identical (test_easy_clip_unchanged
    # depends on that).
    ys, xs = _pixel_grids(H, W)
    z = np.full((H, W), 1.5, dtype=np.float64)
    for _ in range(4):
        x_w = (xs - cx) / fx * z + tx
        y_w = (ys - cy) / fx * z
        z = (1.5 + 0.05 * np.sin(x_w / 0.2) + 0.04 * np.cos(y_w / 0.15)) - tz
    return z


def _camera_model(H, W, B):
    """Shared pinhole model: (fx, cx, cy, tiled (B,1,4,4) intrinsics)."""
    fx = 0.8 * W
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = fx
    K[0, 2], K[1, 2] = cx, cy
    return fx, cx, cy, np.tile(K, (B, 1, 1, 1))


def _pan_poses(translations, B):
    """(B, L, 4, 4) x/z-pan camera poses from per-frame (tx, tz) pairs."""
    poses = []
    for tx, tz in translations:
        P = np.eye(4, dtype=np.float32)
        P[0, 3] = tx
        P[2, 3] = tz
        poses.append(P)
    return np.tile(np.stack(poses), (B, 1, 1, 1))


def synthetic_sequence(
    B: int, L: int, H: int, W: int, seed: int = 0, speed: float = 1.0
):
    r"""Render a batch of synthetic sequences.

    ``speed`` scales the camera's per-frame translation (1.0 = the default
    5 mm/frame pan). Faster cameras expose more novel surface per frame, so
    the fused map grows faster — used by the large-map benchmark config
    (BASELINE.md #4) to push the map into the millions of points.

    Returns numpy ``(rgb (B,L,H,W,3), depths (B,L,H,W,1),
    intrinsics (B,1,4,4), poses (B,L,4,4))``, all float32.
    """
    rng = np.random.RandomState(seed)
    fx, cx, cy, intrinsics = _camera_model(H, W, B)
    cam_ts = [(0.005 * speed * s, 0.002 * speed * s) for s in range(L)]
    depths = np.stack(
        [
            _render_depth(H, W, fx, cx, cy, tx, tz) + 0.0002 * rng.rand(H, W)
            for tx, tz in cam_ts
        ]
        * B
    ).reshape(B, L, H, W, 1).astype(np.float32)
    rgb = rng.rand(B, L, H, W, 3).astype(np.float32)
    poses = _pan_poses(cam_ts, B)
    return rgb, depths, intrinsics, poses


def hard_sequence(
    B: int,
    L: int,
    H: int,
    W: int,
    seed: int = 0,
    speed: float = 12.0,
    noise_sigma: float = 0.005,
    outlier_frac: float = 0.12,
    outlier_mag: float = 0.35,
):
    r"""Render a deliberately HARD tracked-SLAM clip (no reference
    equivalent; VERDICT r2 #4: "a noisy/fast-motion synthetic config where
    plain least-squares visibly degrades").

    Hardness knobs, all defaulted to values at which plain least-squares
    point-to-plane ICP measurably degrades while robust/pyramid/motion-model
    configurations recover:

    - ``speed=12``: 6 cm/frame camera pan (vs the easy clip's 5 mm) with a
      sinusoidal speed modulation (accelerating camera), so a
      constant-velocity prediction is good but not trivially perfect.
    - ``noise_sigma``: Gaussian depth noise, sigma in meters (5 mm — Kinect
      at ~1.5 m range is ~2-4 mm, so this is a pessimistic sensor).
    - ``outlier_frac`` / ``outlier_mag``: per-frame random rectangular
      patches (different every frame, like specular/occlusion artifacts)
      covering ~``outlier_frac`` of pixels, biased by up to ±``outlier_mag``
      meters — gross, frame-inconsistent outliers for both data association
      and fusion.

    Ground-truth poses are exact (corruption enters only through depth), so
    ATE against the returned poses measures tracking robustness. Same return
    contract as :func:`synthetic_sequence`.
    """
    rng = np.random.RandomState(seed)
    fx, cx, cy, intrinsics = _camera_model(H, W, B)

    # accelerating camera: s + 0.3*sin(s/2) modulation on the frame index
    def cam_t(s):
        u = s + 0.3 * np.sin(s / 2.0)
        return 0.005 * speed * u, 0.002 * speed * u

    depths = np.empty((B, L, H, W, 1), dtype=np.float32)
    for b in range(B):
        for s in range(L):
            tx, tz = cam_t(s)
            z = _render_depth(H, W, fx, cx, cy, tx, tz)
            z = z + noise_sigma * rng.randn(H, W)
            # frame-inconsistent outlier patches: ~8 random rectangles
            # sized so their union covers ~outlier_frac of the image
            if outlier_frac > 0 and outlier_mag != 0:
                n_patches = 8
                target = outlier_frac * H * W / n_patches
                ph = max(2, int(np.sqrt(target * H / W)))
                pw = max(2, int(np.sqrt(target * W / H)))
                for _ in range(n_patches):
                    y0 = rng.randint(0, max(1, H - ph))
                    x0 = rng.randint(0, max(1, W - pw))
                    z[y0:y0 + ph, x0:x0 + pw] += outlier_mag * (
                        2.0 * rng.rand() - 1.0
                    )
            depths[b, s, ..., 0] = z.astype(np.float32)
    rgb = rng.rand(B, L, H, W, 3).astype(np.float32)
    poses = _pan_poses([cam_t(s) for s in range(L)], B)
    return rgb, depths, intrinsics, poses


class SyntheticRGBD(RGBDSequenceDataset):
    r"""Dataset-API wrapper over :func:`synthetic_sequence`: ``num_sequences``
    samples, each ``(colors, depths, intrinsics, poses, transforms, name)``,
    matching the TUM/ICL return contract."""

    def __init__(
        self,
        num_sequences: int = 1,
        seqlen: int = 10,
        height: int = 240,
        width: int = 320,
        channels_first: bool = False,
        normalize_color: bool = False,
        seed: int = 0,
    ):
        super().__init__(
            seqlen=seqlen,
            height=height,
            width=width,
            channels_first=channels_first,
            normalize_color=normalize_color,
        )
        self.num_sequences = num_sequences
        self.seed = seed

    def __len__(self):
        return self.num_sequences

    def __getitem__(self, idx: int):
        from .datautils import channels_first as to_cf
        from .datautils import poses_to_transforms

        if not 0 <= idx < self.num_sequences:
            raise IndexError(idx)
        rgb, depths, intrinsics, poses = synthetic_sequence(
            1, self.seqlen, self.height, self.width, seed=self.seed + idx
        )
        colors = rgb[0] * (1.0 if self.normalize_color else 255.0)
        depths = depths[0]
        if self.channels_first:
            colors = to_cf(colors)
            depths = to_cf(depths)
        p = poses[0]
        transforms = np.stack(poses_to_transforms(p)).astype(np.float32)
        return (
            colors.astype(np.float32),
            depths,
            intrinsics[0, 0],
            p,
            transforms,
            f"synthetic_{self.seed + idx}",
        )
