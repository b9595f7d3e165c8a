r"""GradICP odometry provider (TPU-native).

Parity with ``/root/reference/gradslam/odometry/gradicp.py:12`` (gradLM
smooth-damping solver; params lambda_max=2.0, B=1.0, B2=1.0, nu=200.0), with
the batch Python loop (gradicp.py:104-120) replaced by ``vmap``.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ..structures.pointclouds import Pointclouds
from .base import OdometryProvider
from .icputils import point_to_plane_gradICP

__all__ = ["GradICPOdometryProvider"]


class GradICPOdometryProvider(OdometryProvider):
    r"""Differentiable ICP using the gradLM solver — gradients flow through the
    solver trajectory back to the input clouds."""

    def __init__(
        self,
        numiters: int = 20,
        damp: float = 1e-8,
        dist_thresh: Union[float, int, None] = None,
        lambda_max: Union[float, int] = 2.0,
        B: Union[float, int] = 1.0,
        B2: Union[float, int] = 1.0,
        nu: Union[float, int] = 200.0,
        lookahead_assoc: str = "fresh",
        robust_loss: str = None,
        robust_scale: Union[float, int] = 0.05,
        dot_gate: Union[float, None] = None,
    ):
        if dot_gate is not None and not (-1.0 <= dot_gate <= 1.0):
            raise ValueError(
                f"dot_gate must be a cosine in [-1, 1] or None. Got {dot_gate}."
            )
        self.numiters = numiters
        self.damp = damp
        self.dist_thresh = dist_thresh
        self.lambda_max = lambda_max
        self.B = B
        self.B2 = B2
        self.nu = nu
        self.lookahead_assoc = lookahead_assoc
        self.robust_loss = robust_loss
        self.robust_scale = robust_scale
        self.dot_gate = dot_gate

    def provide(
        self,
        maps_pointclouds: Pointclouds,
        frames_pointclouds: Pointclouds,
        initial_transform: jnp.ndarray = None,
    ) -> jnp.ndarray:
        r"""Relative transforms ``(B, 1, 4, 4)`` aligning each live-frame cloud
        to its global map cloud. ``initial_transform (B, 4, 4)`` warm-starts
        the solve (e.g. from a coarser pyramid level); the returned transform
        includes it."""
        if maps_pointclouds.normals is None:
            raise ValueError(
                "maps_pointclouds missing normals. Map normals must be provided "
                "if using GradICPOdometryProvider."
            )
        if len(maps_pointclouds) != len(frames_pointclouds):
            raise ValueError(
                "Batch size of maps_pointclouds and frames_pointclouds should be "
                f"equal ({len(maps_pointclouds)} != {len(frames_pointclouds)})."
            )
        if self.dot_gate is not None and frames_pointclouds.normals is None:
            raise ValueError(
                "dot_gate requires frames_pointclouds normals (the source "
                "normals the gate compares against the map's)."
            )

        def solve_one(src, src_mask, tgt, tgt_normals, tgt_mask, init_T,
                      src_normals=None):
            transform, _ = point_to_plane_gradICP(
                src,
                tgt,
                tgt_normals,
                initial_transform=init_T,
                numiters=self.numiters,
                damp=self.damp,
                dist_thresh=self.dist_thresh,
                lambda_max=self.lambda_max,
                B=self.B,
                B2=self.B2,
                nu=self.nu,
                src_mask=src_mask,
                tgt_mask=tgt_mask,
                lookahead_assoc=self.lookahead_assoc,
                robust_loss=self.robust_loss,
                robust_scale=self.robust_scale,
                src_normals=src_normals,
                dot_gate=self.dot_gate,
            )
            return transform

        B = len(frames_pointclouds)
        if initial_transform is None:
            initial_transform = jnp.broadcast_to(
                jnp.eye(4, dtype=frames_pointclouds.points.dtype), (B, 4, 4)
            )
        args = (
            frames_pointclouds.points,
            frames_pointclouds.nonpad_mask,
            maps_pointclouds.points,
            maps_pointclouds.normals,
            maps_pointclouds.nonpad_mask,
            initial_transform,
        )
        if self.dot_gate is not None:
            transforms = jax.vmap(solve_one)(
                *args, frames_pointclouds.normals
            )
        else:
            transforms = jax.vmap(solve_one)(*args)
        return transforms[:, None]
