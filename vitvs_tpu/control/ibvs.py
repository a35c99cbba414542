"""Classic IBVS control law, jit-native.

Rebuilds the reference's numpy control core (`vitvs_v2.py:566-690`):
interaction-matrix assembly, pseudo-inverse velocity solve, per-axis EMA
smoothing, optical->body axis remap with clipping, and the depth lookup with
its 100 m missing-depth sentinel.

TPU notes: the pinv of the (2k x 6) interaction matrix is available in two
modes — 'svd' for exact `np.linalg.pinv` parity, and 'dls' (damped
least-squares via 6x6 Cholesky normal equations), which avoids an SVD in the
500 Hz loop and is the production default.  Invalid correspondence slots are
excluded by zeroing their rows of both L and e, which drops them from the
normal equations exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vitvs_tpu.core import se3


def interaction_matrix(s_xy: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """Feature Jacobian L in R^{2k x 6}.

    Row pair per point (x, y) at depth z (reference
    `calculate_interaction_matrix`, vitvs_v2.py:650-659):
        [-1/z,   0,  x/z,  x*y, -(1+x^2),  y]
        [  0, -1/z,  y/z, 1+y^2,  -x*y,   -x]
    """
    x = s_xy[..., 0]
    y = s_xy[..., 1]
    z = Z
    zero = jnp.zeros_like(x)
    row_x = jnp.stack([-1.0 / z, zero, x / z, x * y, -(1.0 + x * x), y], axis=-1)
    row_y = jnp.stack([zero, -1.0 / z, y / z, 1.0 + y * y, -x * y, -x], axis=-1)
    L = jnp.stack([row_x, row_y], axis=-2)  # (k, 2, 6)
    return L.reshape(*L.shape[:-3], -1, 6)  # (2k, 6) interleaved x,y rows


def ibvs_velocity(
    s_xy: jnp.ndarray,
    s_star_xy: jnp.ndarray,
    Z: jnp.ndarray,
    lambda_: float,
    valid: jnp.ndarray | None = None,
    mode: str = "svd",
    damping: float = 1e-9,
) -> jnp.ndarray:
    """v_c = -lambda * pinv(L) @ e   (reference vitvs_v2.py:612-622).

    s_xy, s_star_xy: (k, 2) current/goal normalized-plane features.
    Z: (k,) depths.  valid: (k,) bool mask for padded correspondence slots.
    Returns the 6-DoF OPTICAL-frame velocity (vx vy vz wx wy wz).
    """
    e = (s_xy - s_star_xy).reshape(-1)       # (2k,) interleaved, like reshape(2k,1)
    L = interaction_matrix(s_xy, Z)          # (2k, 6)
    if valid is not None:
        m = jnp.repeat(valid.astype(L.dtype), 2)
        L = L * m[:, None]
        e = e * m
    if mode == "svd":
        v = -lambda_ * (jnp.linalg.pinv(L) @ e)
    elif mode == "dls":
        LtL = L.T @ L + damping * jnp.eye(6, dtype=L.dtype)
        Lte = L.T @ e
        v = -lambda_ * jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(LtL), Lte
        )
    else:
        raise ValueError(f"unknown pinv mode {mode!r}")
    return v


class EmaState(NamedTuple):
    """Per-axis EMA of the velocity command (reference vitvs_v2.py:325-343:
    first sample initializes, then ema = a*new + (1-a)*ema)."""

    value: jnp.ndarray        # (6,)
    initialized: jnp.ndarray  # () bool

    @staticmethod
    def init() -> "EmaState":
        return EmaState(jnp.zeros(6, jnp.float32), jnp.zeros((), bool))


def ema_update(state: EmaState, new_value: jnp.ndarray, alpha: float) -> tuple[EmaState, jnp.ndarray]:
    smoothed = jnp.where(
        state.initialized,
        alpha * new_value + (1.0 - alpha) * state.value,
        new_value,
    )
    return EmaState(smoothed, jnp.ones((), bool)), smoothed


def body_twist_from_optical(v_c: jnp.ndarray, max_velocity: float) -> jnp.ndarray:
    """Optical-frame velocity -> clipped body-frame twist, exactly the
    `publish_twist` remap+clip (reference vitvs_v2.py:671-676)."""
    body = se3.optical_twist_to_body(v_c)
    return jnp.clip(body, -max_velocity, max_velocity)


def depth_at_points(depth_m: jnp.ndarray, uv: jnp.ndarray, sentinel: float = 100.0) -> jnp.ndarray:
    """Per-point depth lookup with the reference's failure semantics
    (`get_depth`, vitvs_v2.py:566-586): out-of-bounds or zero depth -> 100 m.

    depth_m: (H, W) z-depth in meters.  uv: (k, 2) pixel coords (u, v).
    """
    h, w = depth_m.shape
    u = uv[..., 0].astype(jnp.int32)
    v = uv[..., 1].astype(jnp.int32)
    in_bounds = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)
    z = depth_m[vc, uc]
    z = jnp.where(z != 0.0, z, sentinel)
    return jnp.where(in_bounds, z, sentinel)
