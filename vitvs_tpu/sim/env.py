"""Environment step/observe: camera kinematics + sensor model.

Replaces the reference's ROS actuation chain (controller -> /camera_vel ->
gazebo_vel_broadcaster -> Gazebo set_model_state, SURVEY §3.2) with a pure
pose integrator, and the RealSense plugin with the analytic renderer.
"""

from __future__ import annotations

import jax.numpy as jnp

from vitvs_tpu.core import se3
from vitvs_tpu.core.camera import CameraIntrinsics
from vitvs_tpu.sim.scene import Scene, render


def observe(scene: Scene, cam: CameraIntrinsics, position: jnp.ndarray,
            quat: jnp.ndarray, quantize_depth_mm: bool = True):
    """(rgb [0,1], depth meters) at a camera pose — the stand-in for the
    /camera/color/image_raw + /camera/depth/image_raw subscriptions."""
    return render(scene, cam, position, quat, quantize_depth_mm)


def env_step(position: jnp.ndarray, quat: jnp.ndarray,
             body_twist: jnp.ndarray, dt: float):
    """Integrate the clipped body-frame twist over one control period.

    Mirrors the broadcaster semantics: twist applied in the camera body
    frame ('base_link' reference frame, gazebo_vel_broadcaster.py:41-48) and
    integrated by the engine; dt defaults to the 50 Hz actuation period via
    VSConfig.control_dt.
    """
    return se3.integrate_body_twist(position, quat, body_twist, dt)
