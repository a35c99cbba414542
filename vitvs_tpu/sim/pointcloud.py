"""Organized XYZRGB point-cloud synthesis from depth (sensor emulation, L1).

TPU-native equivalent of the reference plugin's `FillPointCloudHelper`
(`gazebo_ros_realsense.cpp:105-193`), which walks the depth image in a
scalar double loop per frame.  Here the whole cloud is one vectorized
backprojection (the per-pixel `depth * tan(atan2(i - c, fl))` of the
reference is exactly `depth * (i - c) / fl`), jit/vmap-friendly and
differentiable.

Faithful semantics:
* focal length synthesized from the horizontal FOV as
  ``fl = W / (2 tan(hfov / 2))`` and used for BOTH axes
  (`gazeboros_realsense.cpp:123-124` — the plugin ignores any fy);
* principal point at ``(N - 1) / 2`` on each axis (pixel *indices*, not
  centres — a half-pixel offset from the rendering model's ``N / 2``,
  preserved as-is from the reference);
* points with depth outside ``(near, far)`` become NaN xyz (the ROS
  ``is_dense=false`` convention), colors are attached regardless;
* output is organized (H, W, 6): xyz metres in the OPTICAL frame
  (x right, y down, z forward) + rgb.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# the plugin's pointCloudCutOff_ / pointCloudCutOffMax_ SDF defaults
# (RealSensePlugin.cpp Load): visible range of the emulated D435
DEFAULT_CUTOFF_M = 0.5
DEFAULT_CUTOFF_MAX_M = 5.0


def organized_point_cloud(
    depth_m: jnp.ndarray,
    rgb: jnp.ndarray | None = None,
    hfov_deg: float = 65.0,
    near_m: float = DEFAULT_CUTOFF_M,
    far_m: float = DEFAULT_CUTOFF_MAX_M,
) -> jnp.ndarray:
    """Depth (H, W) metres [+ rgb (H, W, 3)] -> organized cloud (H, W, 6).

    rgb=None fills the color channels with zeros (the plugin's "no image"
    branch); a (H, W) mono image is broadcast to all three channels (its
    "mono" branch)."""
    H, W = depth_m.shape
    fl = W / (2.0 * math.tan(math.radians(hfov_deg) / 2.0))
    i = jnp.arange(W, dtype=jnp.float32) - 0.5 * (W - 1)
    j = jnp.arange(H, dtype=jnp.float32) - 0.5 * (H - 1)
    d = depth_m.astype(jnp.float32)
    x = d * (i[None, :] / fl)
    y = d * (j[:, None] / fl)
    bad = ~((d > near_m) & (d < far_m))
    nan = jnp.float32(jnp.nan)
    xyz = jnp.stack([jnp.where(bad, nan, x),
                     jnp.where(bad, nan, y),
                     jnp.where(bad, nan, d)], axis=-1)
    if rgb is None:
        color = jnp.zeros((H, W, 3), jnp.float32)
    elif rgb.ndim == 2:
        color = jnp.repeat(rgb.astype(jnp.float32)[..., None], 3, axis=-1)
    else:
        color = rgb.astype(jnp.float32)
    return jnp.concatenate([xyz, color], axis=-1)
