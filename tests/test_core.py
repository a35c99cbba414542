"""Golden tests for core: resize parity vs torch, SE(3) parity vs scipy."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
from scipy.spatial.transform import Rotation as R

from vitvs_tpu.core import image, se3
from vitvs_tpu.core.camera import CameraIntrinsics

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# image
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["bilinear", "bicubic", "nearest"])
@pytest.mark.parametrize("shape", [((17, 23), (33, 41)), ((64, 64), (30, 30)), ((22, 22), (37, 37))])
def test_resize_matches_torch(method, shape):
    (h, w), (oh, ow) = shape
    img = RNG.standard_normal((h, w, 3)).astype(np.float32)
    ours = np.asarray(image.resize(jnp.asarray(img), (oh, ow), method=method))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    theirs = (
        F.interpolate(t, size=(oh, ow), mode=method, antialias=False)
        .squeeze(0).permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("method", ["bilinear", "bicubic"])
def test_resize_antialias_matches_torch(method):
    img = RNG.standard_normal((64, 48, 3)).astype(np.float32)
    ours = np.asarray(image.resize(jnp.asarray(img), (20, 16), method=method, antialias=True))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    theirs = (
        F.interpolate(t, size=(20, 16), mode=method, antialias=True)
        .squeeze(0).permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


def test_bicubic_scale_factor_matches_torch():
    # Exactly the DINO pos-embed case: 37x37 grid -> 22.1/37 scale per side
    n = 37
    dim = 8
    grid = RNG.standard_normal((n, n, dim)).astype(np.float32)
    w0 = 22 + 0.1
    scale = w0 / np.sqrt(n * n)
    ours = np.asarray(image.interpolate_bicubic_scale_factor(jnp.asarray(grid), scale, scale))
    t = torch.from_numpy(grid).permute(2, 0, 1)[None]
    theirs = F.interpolate(
        t, scale_factor=(scale, scale), mode="bicubic",
        align_corners=False, recompute_scale_factor=False,
    ).squeeze(0).permute(1, 2, 0).numpy()
    assert ours.shape == theirs.shape == (22, 22, dim)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_normalize():
    img = RNG.random((4, 4, 3)).astype(np.float32)
    out = np.asarray(image.normalize(jnp.asarray(img)))
    ref = (img - np.array(image.IMAGENET_MEAN)) / np.array(image.IMAGENET_STD)
    np.testing.assert_allclose(out, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# se3
# ---------------------------------------------------------------------------


def _rand_quat(n=1):
    q = RNG.standard_normal((n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_multiply_matches_scipy():
    q1, q2 = _rand_quat(5), _rand_quat(5)
    ours = np.asarray(se3.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    theirs = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    # quaternion double cover: compare up to sign
    for a, b in zip(ours, theirs):
        assert np.allclose(a, b, atol=1e-5) or np.allclose(a, -b, atol=1e-5)


def test_quat_rotate_matches_scipy():
    q = _rand_quat(5)
    v = RNG.standard_normal((5, 3)).astype(np.float32)
    ours = np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    theirs = R.from_quat(q).apply(v)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_matrix_quat_roundtrip():
    q = _rand_quat(20)
    m = np.asarray(se3.matrix_from_quat(jnp.asarray(q)))
    np.testing.assert_allclose(m, R.from_quat(q).as_matrix(), atol=1e-5)
    q2 = np.asarray(se3.quat_from_matrix(jnp.asarray(m)))
    for a, b in zip(q2, q):
        assert np.allclose(a, b, atol=1e-5) or np.allclose(a, -b, atol=1e-5)


def test_quat_error_angle_matches_scipy():
    q1, q2 = _rand_quat(10), _rand_quat(10)
    ours = np.asarray(se3.quat_error_angle(jnp.asarray(q1), jnp.asarray(q2)))
    theirs = (R.from_quat(q1).inv() * R.from_quat(q2)).magnitude()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_look_at_matches_reference_construction():
    """Mirror the numpy construction in reference vitvs_v2.py:1270-1290."""
    pos = RNG.uniform(-0.6, 0.6, (8, 3)) + np.array([0, 0, 0.61])
    focal = RNG.uniform(-0.3, 0.3, (8, 3)) * np.array([1, 1, 0]) + np.array([0, 0, 0.01])
    ours = np.asarray(se3.look_at_quaternion(jnp.asarray(pos, dtype=jnp.float32),
                                             jnp.asarray(focal, dtype=jnp.float32)))
    for i in range(len(pos)):
        forward = focal[i] - pos[i]
        forward = forward / np.linalg.norm(forward)
        world_up = np.array([-1.0, 0.0, 0.0])
        right = -np.cross(forward, world_up)
        right = right / np.linalg.norm(right)
        up = np.cross(right, forward)
        rot = np.column_stack((forward, -right, up))
        ref_q = R.from_matrix(rot).as_quat()
        assert np.allclose(ours[i], ref_q, atol=1e-5) or np.allclose(ours[i], -ref_q, atol=1e-5)


def test_rotate_about_body_x_matches_scipy():
    q = _rand_quat(4)
    for angle in [0.0, 90.0, 180.0, 270.0]:
        ours = np.asarray(se3.rotate_about_body_x(jnp.asarray(q), np.radians(angle)))
        theirs = (R.from_quat(q) * R.from_euler("x", angle, degrees=True)).as_quat()
        for a, b in zip(ours, theirs):
            assert np.allclose(a, b, atol=1e-5) or np.allclose(a, -b, atol=1e-5)


def test_optical_twist_to_body_matches_reference_mapping():
    v = RNG.standard_normal(6).astype(np.float32)
    out = np.asarray(se3.optical_twist_to_body(jnp.asarray(v)))
    # publish_twist mapping, reference vitvs_v2.py:671-676
    expect = np.array([v[2], -v[0], -v[1], v[5], -v[3], -v[4]])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_integrate_body_twist_pure_translation():
    pos = jnp.array([0.0, 0.0, 1.0])
    quat = jnp.asarray(R.from_euler("y", 90, degrees=True).as_quat().astype(np.float32))
    # body +x forward; camera pitched 90 deg about y => body x points down (-z world)
    twist = jnp.array([1.0, 0, 0, 0, 0, 0])
    p2, q2 = se3.integrate_body_twist(pos, quat, twist, 0.1)
    np.testing.assert_allclose(np.asarray(p2), [0.0, 0.0, 0.9], atol=1e-5)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(quat), atol=1e-6)


def test_integrate_body_twist_rotation_matches_scipy():
    q0 = _rand_quat(1)[0]
    w = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    _, q2 = se3.integrate_body_twist(jnp.zeros(3), jnp.asarray(q0),
                                     jnp.concatenate([jnp.zeros(3), jnp.asarray(w)]), 0.02)
    ref = (R.from_quat(q0) * R.from_rotvec(w * 0.02)).as_quat()
    assert np.allclose(np.asarray(q2), ref, atol=1e-5) or np.allclose(np.asarray(q2), -ref, atol=1e-5)


# ---------------------------------------------------------------------------
# camera
# ---------------------------------------------------------------------------


def test_camera_defaults_match_reference_config():
    cam = CameraIntrinsics()
    assert cam.cx == 320.0 and cam.cy == 240.0
    # HFOV 65 deg at 640 wide reproduces the config focal length
    cam2 = CameraIntrinsics.from_hfov(640, 480, 65.0)
    assert abs(cam2.fx - 502.3016357421875) < 0.05


def test_pixel_normalized_roundtrip():
    cam = CameraIntrinsics()
    uv = jnp.asarray(RNG.uniform(0, 640, (10, 2)).astype(np.float32))
    xy = cam.pixel_to_normalized(uv)
    back = cam.normalized_to_pixel(xy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-3)
    # reference formula, vitvs_v2.py:640-646
    ref = np.stack([(np.asarray(uv)[:, 0] - 320.0) / cam.fx,
                    (np.asarray(uv)[:, 1] - 240.0) / cam.fy], axis=-1)
    np.testing.assert_allclose(np.asarray(xy), ref, atol=1e-6)
