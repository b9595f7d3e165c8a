r"""Host-side padding helpers (parity with
``/root/reference/gradslam/structures/structutils.py``: ``list_to_padded`` :47,
``padded_to_list`` :89). Numpy/JAX implementations — used at the host/device
boundary only; the on-device representation is always padded."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = ["list_to_padded", "padded_to_list"]


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
