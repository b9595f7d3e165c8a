r"""Shared machinery for RGB-D sequence datasets.

The reference triplicates sequence-chunking/resizing logic across TUM, ICL and
ScanNet (SURVEY §2.1); here it lives once. Datasets are plain Python
``__len__``/``__getitem__`` containers returning numpy arrays — framework
agnostic (drop-in compatible with ``torch.utils.data.DataLoader``), and the
host/device boundary stays explicit: nothing here touches JAX.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

__all__ = ["chunk_sequence", "resize_color", "resize_depth", "RGBDSequenceDataset"]


def chunk_sequence(
    num_frames: int,
    seqlen: int,
    dilation: Optional[int],
    stride: Optional[int],
    start: Optional[int],
    end: Optional[int],
) -> List[List[int]]:
    r"""Frame-index chunking shared by all datasets (reference tum.py:46-57
    diagram): sequences of ``seqlen`` frames, ``dilation`` skipped frames
    between consecutive frames, ``stride`` frames between sequence starts.
    """
    start = 0 if start is None else start
    end = num_frames if end is None else min(end, num_frames)
    dilation = 0 if dilation is None else dilation
    stride = seqlen * (dilation + 1) if stride is None else stride
    # Strictly positive (the reference validates with `< 0` — tum.py:266-276 —
    # so seqlen=0/stride=0 hang its chunking loop forever; fail loudly here).
    if seqlen < 1:
        raise ValueError(f"seqlen must be positive. Got {seqlen}.")
    if dilation < 0:
        raise ValueError(f"dilation must be non-negative. Got {dilation}.")
    if stride < 1:
        raise ValueError(f"stride must be positive. Got {stride}.")
    if start < 0:
        raise ValueError(f"start must be non-negative. Got {start}.")
    if start >= end:
        raise ValueError(f"start ({start}) must be smaller than end ({end}).")
    span = (seqlen - 1) * (dilation + 1) + 1
    chunks = []
    s = start
    while s + span <= end:
        chunks.append([s + i * (dilation + 1) for i in range(seqlen)])
        s += stride
    return chunks


def resize_color(
    color: np.ndarray, height: int, width: int, normalize: bool
) -> np.ndarray:
    r"""Resize (bilinear) + optionally normalize a color image to float32
    (reference tum.py:436-457)."""
    import cv2

    if color.shape[0] != height or color.shape[1] != width:
        color = cv2.resize(color, (width, height), interpolation=cv2.INTER_LINEAR)
    color = np.asarray(color, dtype=np.float32)
    if normalize:
        color = color / 255.0
    return color


def resize_depth(depth: np.ndarray, height: int, width: int, scale: float) -> np.ndarray:
    r"""Resize (nearest) + scale a depth image to meters, float32
    (reference tum.py:459-481)."""
    import cv2

    depth = np.asarray(depth, dtype=np.float32)
    if depth.shape[0] != height or depth.shape[1] != width:
        depth = cv2.resize(depth, (width, height), interpolation=cv2.INTER_NEAREST)
    return depth / scale


class RGBDSequenceDataset:
    r"""Base: stores per-sequence frame paths/poses, serves chunked samples.

    Subclasses populate ``self.samples`` — a list of dicts with keys
    ``color_paths``, ``depth_paths``, optional ``poses`` (list of 4x4),
    ``name``, optional ``timestamps`` — and set ``self.intrinsics_for(idx)``.
    """

    def __init__(
        self,
        seqlen: int = 4,
        height: int = 480,
        width: int = 640,
        channels_first: bool = False,
        normalize_color: bool = False,
        return_depth: bool = True,
        return_intrinsics: bool = True,
        return_pose: bool = True,
        return_transform: bool = True,
        return_names: bool = True,
        depth_scale: float = 5000.0,
        loader: str = "cv2",
    ):
        if loader not in ("cv2", "native"):
            raise ValueError(
                f"loader must be 'cv2' or 'native'. Got {loader!r}."
            )
        self.seqlen = seqlen
        self.height = height
        self.width = width
        self.channels_first = channels_first
        self.normalize_color = normalize_color
        self.return_depth = return_depth
        self.return_intrinsics = return_intrinsics
        self.return_pose = return_pose
        self.return_transform = return_transform
        self.return_names = return_names
        self.depth_scale = depth_scale
        # 'native': decode + resize + scale through the C++ frameio library
        # with threaded prefetch across the sample's frames (production IO
        # path). Falls back to cv2/imageio per frame when the library isn't
        # built or a file isn't PNG/JPEG. Default 'cv2' matches the
        # reference's pixel-exact resize behaviour (bilinear implementations
        # differ at sub-pixel level on resize).
        self.loader = loader
        self.samples: List[dict] = []

    def __len__(self) -> int:
        return len(self.samples)

    # -- hooks ----------------------------------------------------------- #
    def _read_color(self, path: str) -> np.ndarray:
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path))

    def _read_depth(self, path: str) -> np.ndarray:
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path))

    def intrinsics_for(self, idx: int) -> np.ndarray:
        raise NotImplementedError

    def _load_native(self, sample):
        """Decode a whole sample through the threaded native loader.
        Returns ``(colors, depths)`` lists, or ``(None, None)`` to signal
        fallback (library unbuilt or a frame failed to decode)."""
        from . import frameio

        if not frameio.is_available():
            # The user explicitly asked for the native path — degrading to
            # cv2 silently would make IO benchmarks/validation lie.
            import warnings

            if not getattr(self, "_warned_native_unavailable", False):
                self._warned_native_unavailable = True
                warnings.warn(
                    "loader='native' was requested but the native frameio "
                    "library is not built (run native/build.sh); falling "
                    "back to the cv2/imageio path."
                )
            return None, None
        cpaths = list(sample["color_paths"])
        dpaths = list(sample["depth_paths"])
        loader = frameio.FrameLoader(
            self.height, self.width, depth_scale=self.depth_scale,
            normalize_color=self.normalize_color,
        )
        try:
            loader.submit_sequence(cpaths, dpaths)
            colors, depths = [], []
            for i in range(len(cpaths)):
                try:
                    rgb, depth = loader.fetch(i)
                except Exception:
                    import warnings

                    warnings.warn(
                        f"native frameio failed to decode {cpaths[i]!r} / "
                        f"{dpaths[i]!r}; falling back to the cv2/imageio "
                        "path for this sample."
                    )
                    return None, None
                colors.append(rgb)
                depths.append(depth)
            return colors, depths
        finally:
            loader.close()

    # -- main entry ------------------------------------------------------ #
    def __getitem__(self, idx: int):
        from .datautils import channels_first as to_cf
        from .datautils import poses_to_transforms

        sample = self.samples[idx]
        colors, depths = [], []
        native_done = False
        if self.loader == "native":
            colors, depths = self._load_native(sample)
            native_done = colors is not None
        if not native_done:
            colors, depths = [], []
            for cpath, dpath in zip(sample["color_paths"], sample["depth_paths"]):
                colors.append(
                    resize_color(
                        self._read_color(cpath),
                        self.height,
                        self.width,
                        self.normalize_color,
                    )
                )
                depths.append(
                    resize_depth(
                        self._read_depth(dpath), self.height, self.width,
                        self.depth_scale,
                    )
                )
        colors = np.stack(colors)  # (L, H, W, 3)
        depths = np.stack(depths)[..., None]  # (L, H, W, 1)
        if self.channels_first:
            colors = to_cf(colors)
            depths = to_cf(depths)

        output = [colors]
        if self.return_depth:
            output.append(depths)
        if self.return_intrinsics:
            intrinsics = np.asarray(self.intrinsics_for(idx), dtype=np.float32)
            output.append(intrinsics)
        if self.return_pose or self.return_transform:
            if "poses" not in sample:
                raise ValueError(
                    f"{type(self).__name__} provides no poses for this "
                    "sequence; construct it with return_pose=False and "
                    "return_transform=False."
                )
            poses = np.stack(sample["poses"]).astype(np.float32)
            # re-base so frame 0 is identity (reference tum.py:497-499)
            poses = (np.linalg.inv(poses[0:1]) @ poses).astype(np.float32)
            if self.return_pose:
                output.append(poses)
            if self.return_transform:
                output.append(np.stack(poses_to_transforms(poses)).astype(np.float32))
        if self.return_names:
            output.append(sample["name"])
        if "timestamps" in sample and sample.get("return_timestamps", False):
            output.append(sample["timestamps"])
        return tuple(output)
