r"""ctypes bindings for the native frameio loader (``native/frameio``).

The native library decodes PNG/JPEG frames, resizes, and scales depth in a
C++ thread pool — the data-loading runtime role that torch's DataLoader plays
for the reference. Falls back gracefully (``is_available() -> False``) when
the shared library hasn't been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["is_available", "decode_color", "decode_depth", "FrameLoader"]

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    candidates = [
        os.path.join(os.path.dirname(__file__), "..", "..", "native", "libframeio.so"),
        os.path.join(os.path.dirname(__file__), "libframeio.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            lib = ctypes.CDLL(os.path.abspath(path))
            lib.frameio_loader_create.restype = ctypes.c_void_p
            lib.frameio_loader_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ]
            lib.frameio_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.frameio_loader_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ]
            lib.frameio_loader_fetch.restype = ctypes.c_int
            lib.frameio_loader_fetch.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            lib.frameio_decode_color.restype = ctypes.c_int
            lib.frameio_decode_color.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.frameio_decode_depth.restype = ctypes.c_int
            lib.frameio_decode_depth.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]
            _LIB = lib
            return lib
    return None


def is_available() -> bool:
    """True when the native libframeio shared library is built and loadable."""
    return _load_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_color(
    path: str, height: int, width: int, normalize: bool = False
) -> Optional[np.ndarray]:
    """Decode + bilinear-resize a PNG/JPEG color image to ``(H, W, 3)``
    float32 via the native loader; None when the library is unavailable
    (callers fall back to cv2/imageio)."""
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty((height, width, 3), dtype=np.float32)
    ok = lib.frameio_decode_color(
        path.encode(), height, width, int(normalize), _fptr(out)
    )
    return out if ok else None


def decode_depth(
    path: str, height: int, width: int, depth_scale: float
) -> Optional[np.ndarray]:
    """Decode + nearest-resize a 16-bit depth PNG to ``(H, W)`` float32
    meters (``value / depth_scale``) via the native loader; None when the
    library is unavailable."""
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty((height, width), dtype=np.float32)
    ok = lib.frameio_decode_depth(
        path.encode(), height, width, float(depth_scale), _fptr(out)
    )
    return out if ok else None


class FrameLoader:
    r"""Threaded prefetching frame loader.

    Example::

        loader = FrameLoader(height=480, width=640, depth_scale=5000.0)
        loader.submit_sequence(color_paths, depth_paths)
        rgb, depth = loader.fetch(0)   # (H, W, 3) f32, (H, W) f32 meters
    """

    def __init__(
        self,
        height: int,
        width: int,
        depth_scale: float,
        normalize_color: bool = False,
        num_threads: int = 4,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native frameio library not built — run native/build.sh"
            )
        self._lib = lib
        self.height = height
        self.width = width
        self._handle = lib.frameio_loader_create(
            height, width, float(depth_scale), int(normalize_color), num_threads
        )

    def submit(self, index: int, color_path: str, depth_path: str):
        """Queue one frame (color+depth paths) for background decoding."""
        self._lib.frameio_loader_submit(
            self._handle, index, color_path.encode(), depth_path.encode()
        )

    def submit_sequence(self, color_paths: Sequence[str], depth_paths: Sequence[str]):
        """Queue a whole sequence; frame ``i`` is fetched by index ``i``."""
        for i, (c, d) in enumerate(zip(color_paths, depth_paths)):
            self.submit(i, c, d)

    def fetch(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Block until frame ``index`` is decoded; returns ``(rgb (H, W, 3),
        depth (H, W))`` float32."""
        rgb = np.empty((self.height, self.width, 3), dtype=np.float32)
        depth = np.empty((self.height, self.width), dtype=np.float32)
        ok = self._lib.frameio_loader_fetch(
            self._handle, index, _fptr(rgb), _fptr(depth)
        )
        if not ok:
            raise IOError(f"frameio failed to load frame {index}")
        return rgb, depth

    def close(self):
        """Shut down the worker threads and free the native loader."""
        if self._handle:
            self._lib.frameio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
