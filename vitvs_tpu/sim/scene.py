"""Textured-plane camera simulator — the Gazebo stand-in.

The reference's entire scene is a textured poster lying on the ground plane
(`catkin_ws/ibvs/launch/ibvs.launch:21-22` spawns model "resized" at
z = 0.005 with the camera free-floating above), observed by a simulated
RealSense producing 640x480 RGB + depth at HFOV 65 deg
(`realsense2_description/urdf/_d435.gazebo.xacro:32-35`).  A pinhole render
of a textured plane with analytic depth reproduces that observation model as
a pure function — so whole closed-loop rollouts stay on-device and vmap
across environments (SURVEY §7, sim layer).

Conventions: world z-up, plane at z = plane_z; camera body frame has +x
forward (optical axis), mapped to the optical frame via
`se3.R_BODY_FROM_OPTICAL`.  At the reference goal pose (position (0,0,0.61),
quat (0, 0.7071068, 0, 0.7071068) = R_y(90 deg), vitvs_v2.py:1391-1392) the
camera looks straight down with image-right = -y_world and
image-down = -x_world; the texture is mapped so the poster renders upright
in the goal view.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vitvs_tpu.core import se3
from vitvs_tpu.core.camera import CameraIntrinsics

# the emulated RealSense's depth range (RealSensePlugin.cpp:242-276 clip;
# same constants as io_bridge/native.depth_m_to_u16mm and the C bridge)
DEPTH_MIN_RANGE_M = 0.1
DEPTH_MAX_RANGE_M = 10.0


class Scene(NamedTuple):
    texture: jnp.ndarray       # (Ht, Wt, 3) float32 in [0, 1]
    half_size: jnp.ndarray     # (2,) poster half-extents in meters: (world-x
    #                            = texture rows/image-down, world-y = texture
    #                            cols/image-right at the goal view)
    plane_z: jnp.ndarray       # () poster plane height (reference: 0.005)
    background: jnp.ndarray    # (3,) color outside the poster

    @staticmethod
    def create(texture, half_size=0.42, plane_z: float = 0.005,
               background=(0.5, 0.5, 0.5)) -> "Scene":
        """`half_size` is a scalar (square poster) or an (hs_x, hs_y) pair
        for rectangular posters like the reference's 0.6 m x 0.8 m viso
        mesh (resized.dae positions: x in ±0.4, z in ±0.3, spawned R=90°
        Y=90° so the long side lies along world y — ibvs.launch:21-22)."""
        hs = jnp.asarray(half_size, jnp.float32)
        if hs.ndim == 0:
            hs = jnp.stack([hs, hs])
        return Scene(
            texture=jnp.asarray(texture, jnp.float32),
            half_size=hs,
            plane_z=jnp.asarray(plane_z, jnp.float32),
            background=jnp.asarray(background, jnp.float32),
        )


# the reference's actual benchmark scene: the viso poster texture
# (catkin_ws/ibvs/models/viso/materials/textures/resized.png, 1500x1125)
# on its 0.8 x 0.6 m mesh, top face at z = 0.01 (spawned at z=0.005 with
# ±0.005 m thickness, ibvs.launch:21-22 + resized.dae)
POSTER_ASSET = "poster_resized.png"
POSTER_HALF_SIZE = (0.3, 0.4)   # (world-x, world-y) meters
POSTER_PLANE_Z = 0.01


def load_poster_scene(path: str | None = None,
                      background=(0.5, 0.5, 0.5)) -> Scene:
    """The reference's benchmark scene: its real poster texture on the real
    mesh geometry.  `path` overrides the packaged copy of the texture."""
    import os

    from vitvs_tpu.io_bridge.images import load_image

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "assets", POSTER_ASSET)
    return Scene.create(load_image(path), half_size=POSTER_HALF_SIZE,
                        plane_z=POSTER_PLANE_Z, background=background)


def make_synthetic_poster(size: int = 512, seed: int = 0,
                          octaves: tuple[int, int] = (2, 7)) -> np.ndarray:
    """Synthetic poster (multi-scale value noise + fiducial squares) for
    tests/benches, replacing the reference's viso poster JPEG asset.

    `octaves=(lo, hi)`: noise scales 2^lo .. 2^(hi-1).  Lower `hi` gives a
    smoother texture whose patch similarity degrades gracefully under
    misalignment (useful for similarity-scored tests)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size, 3), np.float32)
    for octave in range(*octaves):
        n = 2 ** octave
        coarse = rng.random((n, n, 3)).astype(np.float32)
        reps = size // n
        up = np.kron(coarse, np.ones((reps, reps, 1), np.float32))
        img += up / (octaves[1] - octave)
    img /= img.max()
    # distinctive high-contrast fiducial squares to anchor correspondences
    qs = size // 8
    for (r, c), color in [((0, 0), (1, 0, 0)), ((0, 7), (0, 1, 0)),
                          ((7, 0), (0, 0, 1)), ((7, 7), (1, 1, 0)),
                          ((3, 3), (1, 0, 1)), ((4, 5), (0, 1, 1))]:
        img[r * qs:(r + 1) * qs, c * qs:(c + 1) * qs] = color
    return np.clip(img, 0, 1)


def _bilinear_sample(tex: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture lookup; rows/cols in continuous pixel coords.

    Gathers are the TPU's weakest op and dominate closed-loop rollout wall
    time (measured r2: 4 separate 2-D gathers = 231 ms per batch-16 640x480
    render step — ~95% of the whole servo step).  So the 2x2 neighborhood is
    packed into CHANNELS of a quad texture (one edge-padded shift/concat
    pass, hoisted out of rollout scans as loop-invariant) and sampled with
    ONE flat 1-D gather: 72 ms, bit-identical output.  Gather cost tracks
    rows-fetched, not bytes, so 4x fewer rows ~= 3.2x faster.  The quad
    machinery is shared with the classical pipeline (core/image.pack_quad).
    """
    from vitvs_tpu.core.image import bilinear_packed, pack_quad

    ht, wt, _ = tex.shape
    return bilinear_packed(pack_quad(tex), (ht, wt), rows, cols)


def render(
    scene: Scene,
    cam: CameraIntrinsics,
    position: jnp.ndarray,
    quat: jnp.ndarray,
    quantize_depth_mm: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render (rgb (H,W,3) in [0,1], depth (H,W) meters) from a camera pose.

    Depth is z-depth along the optical axis, quantized to millimeters by
    default to reproduce the uint16-mm depth images the reference's C++
    plugin publishes (`RealSensePlugin.cpp:242-276`, DEPTH_SCALE_M 0.001);
    rays missing the plane get depth 0 ("no return"), which downstream
    becomes the 100 m sentinel (control.depth_at_points).
    """
    d_c = cam.ray_directions()                      # (H, W, 3) optical frame
    r_wb = se3.matrix_from_quat(quat)               # (3, 3)
    r_wc = r_wb @ se3.R_BODY_FROM_OPTICAL
    d_w = jnp.einsum("ij,hwj->hwi", r_wc, d_c)      # (H, W, 3) world
    pz = position[2]
    denom = d_w[..., 2]
    t = (scene.plane_z - pz) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    hit = t > 1e-6                                  # plane in front of camera
    pt = position + t[..., None] * d_w              # (H, W, 3) world points

    ht, wt, _ = scene.texture.shape
    hs_x = scene.half_size[0]
    hs_y = scene.half_size[1]
    # poster upright in the goal view: image-right = -y, image-down = -x
    cols = (hs_y - pt[..., 1]) / (2 * hs_y) * (wt - 1)
    rows = (hs_x - pt[..., 0]) / (2 * hs_x) * (ht - 1)
    on_poster = (
        hit
        & (jnp.abs(pt[..., 0]) <= hs_x)
        & (jnp.abs(pt[..., 1]) <= hs_y)
    )
    rgb = _bilinear_sample(scene.texture, rows, cols)
    rgb = jnp.where(on_poster[..., None], rgb, scene.background)

    # the emulated RealSense clips to its [min_range, max_range] and
    # publishes 0 ("no return") outside it (RealSensePlugin.cpp:242-276;
    # the native bridge and io_bridge/native.py apply the same clip) — a
    # grazing 50 m hit must become the no-return sentinel, not a real depth
    # that cannot even exist in the uint16-mm wire format
    in_range = (t >= DEPTH_MIN_RANGE_M) & (t <= DEPTH_MAX_RANGE_M)
    depth = jnp.where(hit & in_range, t, 0.0)
    if quantize_depth_mm:
        depth = jnp.round(depth * 1000.0) / 1000.0
    return rgb, depth


# D435 stereo-IR extrinsics: left IR sits at the depth frame, right IR
# 50 mm to its right (depth-frame y is image-left, so the offset is
# negative: _d435.urdf.xacro:20-21, d435_cam_depth_to_{left,right}_ir_offset)
IR1_OFFSET_Y = 0.0
IR2_OFFSET_Y = -0.050

# ITU-R BT.601 luma — how a colorless renderer grays an RGB scene
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def render_ir(
    scene: Scene,
    cam: CameraIntrinsics,
    position: jnp.ndarray,
    quat: jnp.ndarray,
    noise_key: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render the two infrared streams (ir1 left, ir2 right), each (H, W)
    in [0, 1], completing the emulated RealSense's four-sensor surface.

    The reference plugin's IR sensors are plain Gazebo `camera` sensors
    rendering the same scene in 8-bit grayscale (format L_INT8, HFOV 65 deg,
    Gaussian noise stddev 0.05 — `_d435.gazebo.xacro:52-100`), published on
    the infra1/infra2 topics (`RealSensePlugin.cpp:26-27`,
    `gazebo_ros_realsense.cpp`).  Emulated here as the BT.601 luma of a
    pinhole render from each IR pose: the left IR is co-located with the
    depth frame, the right IR offset 50 mm along body -y
    (`_d435.urdf.xacro:20-21`), giving the pair the true stereo disparity
    f*B/Z.  With `noise_key` the plugin's sensor noise is added before the
    8-bit quantization.
    """
    r_wb = se3.matrix_from_quat(quat)
    outs = []
    keys = (None, None) if noise_key is None else jax.random.split(noise_key)
    for off_y, key in zip((IR1_OFFSET_Y, IR2_OFFSET_Y), keys):
        pos = position + r_wb @ jnp.array([0.0, off_y, 0.0], jnp.float32)
        rgb, _ = render(scene, cam, pos, quat, quantize_depth_mm=False)
        ir = rgb @ jnp.asarray(_LUMA)
        if key is not None:
            ir = ir + 0.05 * jax.random.normal(key, ir.shape, ir.dtype)
        # L_INT8 wire format: 8-bit levels, like the mm depth quantization
        ir = jnp.round(jnp.clip(ir, 0.0, 1.0) * 255.0) / 255.0
        outs.append(ir)
    return outs[0], outs[1]
