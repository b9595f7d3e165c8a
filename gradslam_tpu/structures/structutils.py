r"""Host-side padding helpers (parity with
``/root/reference/gradslam/structures/structutils.py``: ``list_to_padded`` :47,
``padded_to_list`` :89). Numpy/JAX implementations — used at the host/device
boundary only; the on-device representation is always padded."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = [
    "coerce_torch",
    "list_to_padded",
    "padded_to_list",
    "numpy_to_plotly_image",
    "plotly_image_hovertemplate",
    "img_to_b64str",
    "animation_slider",
    "animation_updatemenus",
]


def coerce_torch(x):
    """Convert a ``torch.Tensor`` to a host numpy array; pass everything else
    through untouched.

    The structure constructors call this so reference users migrating a torch
    pipeline (the whole audience of ``docs/migration.md``) can feed torch
    tensors directly — ``jnp`` does not understand torch dtypes, so without
    this the tensor is stored raw and dies later in the first ``jnp`` op with
    an opaque dtype error. Detached + copied to CPU; autograd history does
    not cross the framework boundary. Duck-typed on the module name so torch
    is never imported here."""
    if x is not None and type(x).__module__.partition(".")[0] == "torch":
        return np.asarray(x.detach().cpu())
    return x


def _frame_args(duration):
    # reference rgbdimages.py:805-812
    return {
        "frame": {"duration": duration, "redraw": True},
        "mode": "immediate",
        "fromcurrent": True,
        "transition": {"duration": duration, "easing": "linear"},
    }


def animation_slider(num_frames: int) -> list:
    r"""Plotly slider config for frame-by-frame animation — plain dicts,
    exact reference layout (rgbdimages.py:840-857)."""
    steps = [
        {"args": [[i], _frame_args(0)], "label": i, "method": "animate"}
        for i in range(num_frames)
    ]
    return [
        {
            "active": 0,
            "yanchor": "top",
            "xanchor": "left",
            "currentvalue": {"prefix": "Frame: "},
            "pad": {"b": 10, "t": 60},
            "len": 0.9,
            "x": 0.1,
            "y": 0,
            "steps": steps,
        }
    ]


def animation_updatemenus(ms_per_frame: int) -> list:
    r"""Plotly play/stop buttons — plain dicts, exact reference layout
    (rgbdimages.py:858-881)."""
    return [
        {
            "buttons": [
                {
                    "args": [None, _frame_args(ms_per_frame)],
                    "label": "&#9654;",
                    "method": "animate",
                },
                {
                    "args": [[None], _frame_args(0)],
                    "label": "&#9724;",
                    "method": "animate",
                },
            ],
            "direction": "left",
            "pad": {"r": 10, "t": 70},
            "showactive": False,
            "type": "buttons",
            "x": 0.1,
            "xanchor": "right",
            "y": 0,
            "yanchor": "top",
        }
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


def plotly_image_hovertemplate(is_depth: bool = False, scale=None) -> str:
    r"""Hover template for image traces — exact reference strings
    (structutils.py:141-151). Pure helper (no plotly import) so the format
    is testable without the optional dep."""
    hovertemplate = "x: %%{x}<br>y: %%{y}<br>%s: %s"
    if not is_depth:
        hovertemplate = hovertemplate % ("color", "[%{z[0]}, %{z[1]}, %{z[2]}]")
    else:
        hovertemplate = hovertemplate % ("depth", "%{z[0]}")
    if scale is not None:
        scale = int(scale) if int(scale) == scale else scale
        hovertemplate += f"<br>scale: x{scale}<br>"
    hovertemplate += "<extra></extra>"
    return hovertemplate


def numpy_to_plotly_image(img: np.ndarray, name=None, is_depth: bool = False,
                          scale=None, quality: int = 95):
    r"""Wrap an image array as a ``plotly.graph_objects.Image`` trace with the
    reference's hover formatting (parity with structutils.py:127-153).
    Requires plotly."""
    import plotly.graph_objects as go

    img_str = img_to_b64str(np.asarray(img), quality)
    return go.Image(
        source=img_str,
        hovertemplate=plotly_image_hovertemplate(is_depth, scale),
        name=name,
    )


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
