"""Pinhole camera model.

The reference derives its intrinsics from the Gazebo RealSense xacro
(HFOV 65 deg at 640x480 => f = 320 / tan(32.5 deg) = 502.30 px, principal point
at the image centre); see reference `catkin_ws/ibvs/config/config.yaml:1-7` and
`catkin_ws/ibvs/src/vitvs_v2.py:277-283`.  The C++ sensor plugin synthesizes
the same focal length (`gazebo_ros_realsense.cpp:249-275`).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Static pinhole intrinsics.  Frozen dataclass => hashable, jit-static."""

    width: int = 640
    height: int = 480
    fx: float = 502.3016357421875
    fy: float = 502.3016357421875
    # Principal point defaults to the image centre, as in the reference.
    cx: float | None = None
    cy: float | None = None

    def __post_init__(self):
        if self.cx is None:
            object.__setattr__(self, "cx", self.width / 2.0)
        if self.cy is None:
            object.__setattr__(self, "cy", self.height / 2.0)

    @staticmethod
    def from_hfov(width: int, height: int, hfov_deg: float) -> "CameraIntrinsics":
        """Intrinsics from a horizontal field of view, mirroring the Gazebo
        plugin's `f = 0.5 * W / tan(HFOV / 2)` synthesis."""
        f = 0.5 * width / math.tan(math.radians(hfov_deg) / 2.0)
        return CameraIntrinsics(width=width, height=height, fx=f, fy=f)

    def pixel_to_normalized(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixel coords (..., 2) [u, v] -> normalized image-plane coords
        (..., 2) [x, y] = [(u - cx)/fx, (v - cy)/fy].

        Mirrors `transform_to_real_world` (reference vitvs_v2.py:634-648).
        """
        u = uv[..., 0]
        v = uv[..., 1]
        return jnp.stack([(u - self.cx) / self.fx, (v - self.cy) / self.fy], axis=-1)

    def normalized_to_pixel(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Inverse of :meth:`pixel_to_normalized`."""
        x = xy[..., 0]
        y = xy[..., 1]
        return jnp.stack([x * self.fx + self.cx, y * self.fy + self.cy], axis=-1)

    def ray_directions(self) -> jnp.ndarray:
        """(H, W, 3) unnormalized ray directions in the OPTICAL frame
        (x right, y down, z forward), one per pixel centre."""
        u = jnp.arange(self.width, dtype=jnp.float32) + 0.5
        v = jnp.arange(self.height, dtype=jnp.float32) + 0.5
        x = (u - self.cx) / self.fx
        y = (v - self.cy) / self.fy
        xx, yy = jnp.meshgrid(x, y)  # (H, W)
        return jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)


def reproject_via_plane(cam: CameraIntrinsics, uv_a: jnp.ndarray,
                        pos_a, quat_a, pos_b, quat_b, plane_z):
    """Ground-truth pixel correspondence view A -> view B via the z=plane_z
    world plane (the poster; the benchmark scene is exactly a textured plane,
    reference ibvs.launch:21-22).

    Back-projects pixels `uv_a` (..., 2) from camera A (body pose `pos_a`,
    `quat_a`; optical frame per se3.R_BODY_FROM_OPTICAL), intersects the
    plane, reprojects into camera B.  Returns `(uv_b, world, t_hit, z_b)`:
    pixel coords in B, world-plane hit points, the ray parameter in A
    (<= 0 means the plane is behind A), and depth along B's optical axis
    (<= 0 means behind B).  Shared by train/finetune's GT patch
    correspondence and the scripts/diag_* reprojection tools — one copy of
    the frame conventions."""
    from vitvs_tpu.core import se3

    xy = cam.pixel_to_normalized(jnp.asarray(uv_a, jnp.float32))
    d_c = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
    r_wa = se3.matrix_from_quat(jnp.asarray(quat_a)) @ se3.R_BODY_FROM_OPTICAL
    d_w = d_c @ r_wa.T
    t_hit = (plane_z - pos_a[..., 2]) / jnp.where(
        jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])
    world = jnp.asarray(pos_a) + t_hit[..., None] * d_w
    r_wb = se3.matrix_from_quat(jnp.asarray(quat_b)) @ se3.R_BODY_FROM_OPTICAL
    p_c = (world - jnp.asarray(pos_b)) @ r_wb
    z_b = p_c[..., 2]
    uv_b = cam.normalized_to_pixel(p_c[..., :2] / jnp.maximum(z_b, 1e-9)[..., None])
    return uv_b, world, t_hit, z_b
