r"""Host-side padding helpers (parity with
``/root/reference/gradslam/structures/structutils.py``: ``list_to_padded`` :47,
``padded_to_list`` :89). Numpy/JAX implementations — used at the host/device
boundary only; the on-device representation is always padded."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = [
    "list_to_padded",
    "padded_to_list",
    "numpy_to_plotly_image",
    "img_to_b64str",
]


def img_to_b64str(img: np.ndarray, quality: int = 95) -> str:
    r"""JPEG-encode an image array to a base64 data-URI string (parity with
    the reference structutils.py:156; used by the plotly frame viewer)."""
    import base64

    import cv2

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    bgr = img[..., ::-1] if img.ndim == 3 else img
    ok, buf = cv2.imencode(".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    if not ok:
        raise ValueError("JPEG encoding failed")
    return "data:image/jpeg;base64," + base64.b64encode(buf.tobytes()).decode()


def numpy_to_plotly_image(img: np.ndarray, name=None, is_depth: bool = False,
                          scale=None):
    r"""Wrap an image array as a ``plotly.graph_objects.Image`` trace (parity
    with the reference structutils.py:127). Requires plotly."""
    import plotly.graph_objects as go

    img = np.asarray(img)
    if is_depth:
        valid = img > 0
        rng = img.max() - img[valid].min() if valid.any() else 1.0
        rng = rng if rng > 0 else 1.0
        norm = np.zeros_like(img, dtype=np.float32)
        if valid.any():
            norm[valid] = (img[valid] - img[valid].min()) / rng
        img = (np.stack([norm] * 3, axis=-1) * 255).astype(np.uint8)
    return go.Image(source=img_to_b64str(img), name=name)


def list_to_padded(
    x: Sequence,
    pad_size: Optional[Tuple[int, ...]] = None,
    pad_value: float = 0.0,
    equisized: bool = False,
):
    r"""Pad a list of ``(N_b, K)`` arrays into a ``(B, maxN, K)`` array."""
    if equisized:
        return jnp.stack([jnp.asarray(y) for y in x], axis=0)
    arrs = [np.asarray(y) for y in x]
    if pad_size is None:
        pad_dim0 = max(a.shape[0] for a in arrs)
        pad_dim1 = max(a.shape[1] for a in arrs) if arrs[0].ndim == 2 else None
    else:
        if any(a.ndim != len(pad_size) for a in arrs):
            raise ValueError("Pad size must contain target size for all dimensions.")
        pad_dim0, pad_dim1 = pad_size[0], (pad_size[1] if len(pad_size) > 1 else None)
    if arrs[0].ndim == 1:
        out = np.full((len(arrs), pad_dim0), pad_value, dtype=arrs[0].dtype)
        for b, a in enumerate(arrs):
            out[b, : a.shape[0]] = a
    else:
        out = np.full((len(arrs), pad_dim0, pad_dim1), pad_value, dtype=arrs[0].dtype)
        for b, a in enumerate(arrs):
            out[b, : a.shape[0], : a.shape[1]] = a
    return jnp.asarray(out)


def padded_to_list(
    x, split_size: Optional[Union[Sequence[int], int]] = None
) -> List[np.ndarray]:
    r"""Split a padded ``(B, maxN, K)`` array back into a list of arrays."""
    x = np.asarray(x)
    out = list(x)
    if split_size is None:
        return out
    if len(split_size) != x.shape[0]:
        raise ValueError(
            f"Split size must be of same length as inputs first dimension. "
            f"Got {len(split_size)} and {x.shape[0]}."
        )
    return [
        out[b][: split_size[b]] if isinstance(split_size[b], int) else out[b][
            : split_size[b][0], : split_size[b][1]
        ]
        for b in range(x.shape[0])
    ]
