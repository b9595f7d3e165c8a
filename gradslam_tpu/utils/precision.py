r"""Precision helpers.

On TPU, ``jnp.matmul``/``jnp.einsum`` default to bf16 MXU passes, which loses
~3 decimal digits — fatal for SE(3) geometry (pose chains compound over frames
and ICP iterations). All small-matrix geometry in this framework contracts with
``HIGHEST`` precision: these ops are bandwidth-bound (contraction dims of 3-4),
so full-precision passes cost nothing while keeping fp32 accuracy.
"""

import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

matmul_hp = functools.partial(jnp.matmul, precision=HIGHEST)
einsum_hp = functools.partial(jnp.einsum, precision=HIGHEST)
