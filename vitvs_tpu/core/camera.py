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
