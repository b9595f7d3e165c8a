r"""SO(3)/SE(3) Lie-group operations (TPU-native JAX implementation).

Batched, branch-free re-design of the reference
(``/root/reference/gradslam/geometry/se3utils.py``: ``so3_hat`` :11, ``se3_hat``
:29, ``so3_exp`` :47, ``se3_exp`` :77). The reference operates on single
6-vectors inside the ICP iteration loop; here everything broadcasts over
arbitrary leading batch dimensions so the whole ICP solve can be ``vmap``-ed
over the batch axis and traced once under ``jit``.

The small-angle branch of the reference (first-order ``I + w^`` for
``|w| < 1e-6``) is reproduced with ``jnp.where`` selects so the functions stay
differentiable (no NaN gradients at theta == 0).
"""

from __future__ import annotations

import jax.numpy as jnp
from ..utils.precision import matmul_hp

_EPS = 1e-6

__all__ = ["so3_hat", "se3_hat", "so3_exp", "se3_exp"]


def so3_hat(omega) -> jnp.ndarray:
    r"""Hat operator for so(3): ``(*, 3) -> (*, 3, 3)`` skew matrices."""
    omega = jnp.asarray(omega)
    if omega.shape[-1] != 3:
        raise ValueError(f"omega must have shape (*, 3). Got {omega.shape}.")
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(wx)
    row0 = jnp.stack([zero, -wz, wy], axis=-1)
    row1 = jnp.stack([wz, zero, -wx], axis=-1)
    row2 = jnp.stack([-wy, wx, zero], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def se3_hat(xi) -> jnp.ndarray:
    r"""Hat operator for se(3): twist ``(*, 6) -> (*, 4, 4)``.

    Twist layout is ``xi = (v, omega)`` as in the reference (se3utils.py:29-44).
    """
    xi = jnp.asarray(xi)
    if xi.shape[-1] != 6:
        raise ValueError(f"xi must have shape (*, 6). Got {xi.shape}.")
    v, omega = xi[..., :3], xi[..., 3:]
    omega_hat = so3_hat(omega)
    top = jnp.concatenate([omega_hat, v[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :])
    return jnp.concatenate([top, bottom], axis=-2)


def _rodrigues_coefficients(omega: jnp.ndarray):
    """Return (A, B, C) Rodrigues coefficients with the reference's small-angle
    fallback, computed branch-free for differentiability."""
    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < _EPS**2
    # Double-where: sqrt must never see 0, or its inf gradient poisons the
    # selected branch through the chain rule.
    safe_theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    theta = jnp.where(small, jnp.zeros_like(safe_theta), safe_theta)
    s, c = jnp.sin(safe_theta), jnp.cos(safe_theta)
    A = jnp.where(small, jnp.ones_like(theta), s / safe_theta)
    B = jnp.where(small, jnp.zeros_like(theta), (1.0 - c) / safe_theta**2)
    C = jnp.where(small, jnp.zeros_like(theta), (safe_theta - s) / safe_theta**3)
    return A, B, C, small


def so3_exp(omega) -> jnp.ndarray:
    r"""Exponential map so(3) -> SO(3): ``(*, 3) -> (*, 3, 3)``.

    Reference semantics (se3utils.py:47-75), including the first-order
    ``I + w^`` small-angle branch.
    """
    omega = jnp.asarray(omega)
    omega_hat = so3_hat(omega)
    omega_hat_sq = matmul_hp(omega_hat, omega_hat)
    A, B, _, small = _rodrigues_coefficients(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), omega_hat.shape)
    R_full = eye + A[..., None, None] * omega_hat + B[..., None, None] * omega_hat_sq
    R_small = eye + omega_hat
    return jnp.where(small[..., None, None], R_small, R_full)


def se3_exp(xi) -> jnp.ndarray:
    r"""Exponential map se(3) -> SE(3): twist ``(*, 6) -> (*, 4, 4)``.

    Twist layout ``xi = (v, omega)``; the reference accepts ``(6,)``, ``(6, 1)``
    or ``(1, 6)`` (se3utils.py:77-115) — trailing/leading singleton axes are
    squeezed here for parity, and arbitrary batch dims are supported.
    """
    xi = jnp.asarray(xi)
    if xi.ndim >= 2 and xi.shape[-1] == 1 and xi.shape[-2] == 6:
        xi = xi[..., 0]
    if xi.shape[-1] != 6:
        raise ValueError(f"xi must have shape (*, 6). Got {xi.shape}.")
    v, omega = xi[..., :3], xi[..., 3:]
    omega_hat = so3_hat(omega)
    omega_hat_sq = matmul_hp(omega_hat, omega_hat)
    A, B, C, small = _rodrigues_coefficients(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), omega_hat.shape)
    R_full = eye + A[..., None, None] * omega_hat + B[..., None, None] * omega_hat_sq
    V_full = eye + B[..., None, None] * omega_hat + C[..., None, None] * omega_hat_sq
    R_small = eye + omega_hat
    V_small = eye + omega_hat
    R = jnp.where(small[..., None, None], R_small, R_full)
    V = jnp.where(small[..., None, None], V_small, V_full)
    t = matmul_hp(V, v[..., None])
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)
