"""SE(3) / quaternion utilities (pure JAX, vmap/jit friendly).

Quaternions use the scalar-last ``[x, y, z, w]`` convention throughout, matching
``scipy.spatial.transform.Rotation`` as used by the reference
(`catkin_ws/ibvs/src/vitvs_v2.py:843-861`, `:1253-1342`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion primitives (xyzw)
# ---------------------------------------------------------------------------


def quat_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 (apply q2's rotation first, then q1's)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (..., 3), angle (...,) radians -> quaternion (..., 4)."""
    half = angle / 2.0
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation magnitude in radians, matching scipy's Rotation.magnitude()."""
    q = quat_normalize(q)
    sin_half = jnp.linalg.norm(q[..., :3], axis=-1)
    cos_half = jnp.abs(q[..., 3])
    return 2.0 * jnp.arctan2(sin_half, cos_half)


def quat_error_angle(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angle of relative rotation q1^-1 * q2, radians.

    Mirrors `(current.inv() * desired).magnitude()` in the reference's
    `calculate_end_error` (vitvs_v2.py:857-859)."""
    rel = quat_multiply(quat_conjugate(quat_normalize(q1)), quat_normalize(q2))
    return quat_angle(rel)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) xyzw -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) xyzw.

    Branch-free Shepperd's method (selects the numerically best of the four
    candidate constructions), safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    # candidates in wxyz order above; diag entries pick which is safest
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4) [cand, wxyz]

    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(diag, axis=-1)
    best = jnp.take_along_axis(cand, idx[..., None, None], axis=-2)[..., 0, :]
    best = quat_normalize_wxyz(best)
    # reorder wxyz -> xyzw
    return jnp.concatenate([best[..., 1:], best[..., :1]], axis=-1)


def quat_normalize_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Pose = (position (3,), quaternion (4,) xyzw), world-from-body.
# ---------------------------------------------------------------------------


def integrate_body_twist(
    position: jnp.ndarray,
    quat: jnp.ndarray,
    twist: jnp.ndarray,
    dt: float | jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate a BODY-frame twist [vx vy vz wx wy wz] over dt.

    This is the TPU stand-in for the Gazebo actuation chain: the reference's
    broadcaster writes the twist into Gazebo with reference_frame 'base_link'
    (`gazebo_vel_broadcaster.py:41-48`), so the linear/angular velocity is
    expressed in the camera body frame and integrated by the physics engine.

    Uses first-order integration with an exact rotation exponential.
    """
    v = twist[..., :3]
    w = twist[..., 3:6]
    # position advances along the body-frame linear velocity rotated to world
    position = position + quat_rotate(quat, v) * dt
    # orientation: right-multiply (body-frame angular velocity)
    angle = jnp.linalg.norm(w, axis=-1)
    axis = w / jnp.maximum(angle[..., None], 1e-12)
    dq = quat_from_axis_angle(axis, angle * dt)
    quat = quat_normalize(quat_multiply(quat, dq))
    return position, quat


def look_at_quaternion(camera_position: jnp.ndarray, focal_point: jnp.ndarray) -> jnp.ndarray:
    """Camera orientation with body +x pointing at `focal_point`.

    Reimplements the reference's `calculate_look_at_orientation`
    (vitvs_v2.py:1253-1292): forward = normalize(focal - pos); world 'up'
    reference vector is [-1, 0, 0]; right = -cross(forward, up) normalized;
    up = cross(right, forward); R = [forward, -right, up] column-stacked.
    """
    forward = focal_point - camera_position
    forward = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)
    world_up = jnp.array([-1.0, 0.0, 0.0], dtype=forward.dtype)
    right = -jnp.cross(forward, jnp.broadcast_to(world_up, forward.shape))
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    up = jnp.cross(right, forward)
    rot = jnp.stack([forward, -right, up], axis=-1)  # columns
    return quat_from_matrix(rot)


def rotate_about_body_x(quat: jnp.ndarray, angle_rad: jnp.ndarray) -> jnp.ndarray:
    """Post-rotate about the body x (optical) axis: q * R_x(angle).

    Mirrors `rotate_camera_x_axis` (vitvs_v2.py:1125-1148) and the z-axis
    (optical) spin applied in `apply_z_axis_rotation` (vitvs_v2.py:1295-1342).
    """
    axis = jnp.array([1.0, 0.0, 0.0], dtype=quat.dtype)
    dq = quat_from_axis_angle(axis, jnp.asarray(angle_rad))
    return quat_multiply(quat, dq)


# Optical-frame <-> body-frame axis convention.  The reference publishes the
# IBVS optical-frame velocity remapped into the camera body frame
# (`publish_twist`, vitvs_v2.py:671-676):
#   body lin = ( v_opt[2], -v_opt[0], -v_opt[1])
#   body ang = ( v_opt[5], -v_opt[3], -v_opt[4])
# i.e. optical x(right) = -body y, optical y(down) = -body z,
#      optical z(forward) = body x.
R_BODY_FROM_OPTICAL = jnp.array(
    [[0.0, 0.0, 1.0],
     [-1.0, 0.0, 0.0],
     [0.0, -1.0, 0.0]],
    dtype=jnp.float32,
)


def optical_twist_to_body(v_c: jnp.ndarray) -> jnp.ndarray:
    """6-DoF optical-frame velocity -> body-frame twist (no clipping)."""
    lin = v_c[..., :3] @ R_BODY_FROM_OPTICAL.T
    ang = v_c[..., 3:6] @ R_BODY_FROM_OPTICAL.T
    return jnp.concatenate([lin, ang], axis=-1)
