"""Simulator tests: analytic geometry, depth model, perturbations."""

import numpy as np
import jax
import jax.numpy as jnp

from vitvs_tpu.core.camera import CameraIntrinsics
from vitvs_tpu.core import se3
from vitvs_tpu.sim import Scene, env_step, make_synthetic_poster, observe, perturb_texture, render

CAM = CameraIntrinsics()
GOAL_POS = jnp.array([0.0, 0.0, 0.61])
GOAL_QUAT = jnp.array([0.0, 0.7071068, 0.0, 0.7071068])  # vitvs_v2.py:1392


def _scene():
    return Scene.create(make_synthetic_poster(256), half_size=0.42, plane_z=0.005)


def test_depth_fronto_parallel_uniform():
    """Looking straight down at a plane, z-depth is uniform = height above
    plane (and mm-quantized like the uint16 depth images)."""
    rgb, depth = render(_scene(), CAM, GOAL_POS, GOAL_QUAT)
    d = np.asarray(depth)
    np.testing.assert_allclose(d, 0.605, atol=5e-4)  # 0.61 - 0.005
    assert rgb.shape == (480, 640, 3)
    # quantized to mm
    assert np.allclose(d * 1000, np.round(d * 1000), atol=1e-3)


def test_poster_upright_in_goal_view():
    """Interior fiducials of the texture must project where the pinhole
    model predicts (image-right = -y_world, image-down = -x_world)."""
    tex = make_synthetic_poster(256)
    rgb, _ = render(Scene.create(tex), CAM, GOAL_POS, GOAL_QUAT)
    img = np.asarray(rgb)
    z, hs = 0.605, 0.42

    def probe(tex_row, tex_col):
        # texture pixel -> world point -> image pixel
        x = hs - tex_row / 255.0 * 2 * hs
        y = hs - tex_col / 255.0 * 2 * hs
        u = int(round(320 + 502.3016357421875 * (-y) / z))
        v = int(round(240 + 502.3016357421875 * (-x) / z))
        return img[v, u]

    # block (3,3) of the 8x8 fiducial grid is magenta (rows/cols 96..128)
    c = probe(112, 112)
    assert c[0] > 0.9 and c[1] < 0.1 and c[2] > 0.9, c
    # block (4,5) is cyan (rows 128..160, cols 160..192)
    c = probe(144, 176)
    assert c[0] < 0.1 and c[1] > 0.9 and c[2] > 0.9, c


def test_background_outside_poster():
    rgb, depth = render(_scene(), CAM, jnp.array([0.0, 0.0, 2.0]), GOAL_QUAT)
    img = np.asarray(rgb)
    np.testing.assert_allclose(img[0, 0], [0.5, 0.5, 0.5], atol=1e-6)
    # depth still hits the ground plane
    assert abs(float(depth[0, 0])) > 0


def test_rays_missing_plane_get_zero_depth():
    # camera looking up: no intersection -> depth 0 ("no return")
    up_quat = jnp.asarray(np.array([0.0, -0.7071068, 0.0, 0.7071068], np.float32))
    _, depth = render(_scene(), CAM, GOAL_POS, up_quat)
    assert float(jnp.max(depth)) == 0.0


def test_translation_changes_view_consistently():
    """Moving the camera +x world shifts image content DOWN by f*dx/z pixels
    (v = cy - f*(x - px)/z increases with px at the goal orientation)."""
    scene = _scene()
    rgb0, _ = render(scene, CAM, GOAL_POS, GOAL_QUAT)
    rgb1, _ = render(scene, CAM, GOAL_POS + jnp.array([0.05, 0.0, 0.0]), GOAL_QUAT)
    a = np.asarray(rgb0)
    b = np.asarray(rgb1)
    shift = int(round(502.3 * 0.05 / 0.605))
    crop_a = a[60:-(60 + shift), 60:-60]
    crop_b = b[shift + 60:-60, 60:-60]
    err_aligned = np.abs(crop_a - crop_b).mean()
    err_naive = np.abs(a[60:-60, 60:-60] - b[60:-60, 60:-60]).mean()
    assert err_aligned < err_naive * 0.25


def test_env_step_descends_toward_plane():
    # optical +z (forward) motion at the goal orientation descends
    v_c = jnp.array([0.0, 0.0, 0.1, 0.0, 0.0, 0.0])  # optical frame
    body = se3.optical_twist_to_body(v_c)
    pos, quat = env_step(GOAL_POS, GOAL_QUAT, body, 0.5)
    assert float(pos[2]) < 0.61
    np.testing.assert_allclose(np.asarray(pos[:2]), [0, 0], atol=1e-6)


def test_perturb_texture_properties():
    tex = jnp.asarray(make_synthetic_poster(128))
    key = jax.random.PRNGKey(489)  # reference perturbation seed
    out = perturb_texture(key, tex)
    o = np.asarray(out)
    assert o.shape == tex.shape
    assert o.min() >= 0.0 and o.max() <= 1.0
    assert np.abs(o - np.asarray(tex)).mean() > 0.01  # actually perturbed
    # deterministic per key
    np.testing.assert_array_equal(o, np.asarray(perturb_texture(key, tex)))
    # different keys differ
    o2 = np.asarray(perturb_texture(jax.random.PRNGKey(490), tex))
    assert np.abs(o - o2).mean() > 1e-3


def test_perturb_vmappable():
    tex = jnp.asarray(make_synthetic_poster(64))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    out = jax.vmap(lambda k: perturb_texture(k, tex))(keys)
    assert out.shape == (8, 64, 64, 3)


def test_real_poster_scene_geometry():
    """The packaged reference poster: 1500x1125 texture on the 0.8x0.6 m
    mesh, top face at z=0.01 (resized.dae + ibvs.launch:21-22).  The goal
    view must be fully on-poster at uniform 0.60 m depth."""
    from vitvs_tpu.sim import load_poster_scene

    scene = load_poster_scene()
    assert scene.texture.shape == (1125, 1500, 3)
    np.testing.assert_allclose(np.asarray(scene.half_size), [0.3, 0.4])
    rgb, depth = render(scene, CAM, GOAL_POS, GOAL_QUAT)
    d = np.asarray(depth)
    np.testing.assert_allclose(d, 0.60, atol=5e-4)
    img = np.asarray(rgb)
    # no background anywhere: the poster covers the full goal view
    assert not np.any(np.all(np.abs(img - 0.5) < 1e-7, axis=-1))


def test_rectangular_poster_mapping():
    """Rectangular half_size maps texture cols along world y and rows along
    world x independently (corner texels land at the right world corners)."""
    tex = np.zeros((8, 16, 3), np.float32)
    tex[0, 0] = [1, 0, 0]      # row 0, col 0 -> world (+hs_x, +hs_y)
    tex[-1, -1] = [0, 1, 0]    # row ht-1, col wt-1 -> world (-hs_x, -hs_y)
    # extents chosen inside the camera FOV at z=0.61 (±0.38 m in y, ±0.28 in x)
    scene = Scene.create(tex, half_size=(0.2, 0.35), plane_z=0.0)
    z = 0.61
    f = 502.3016357421875
    rgb, _ = render(scene, CAM, GOAL_POS, GOAL_QUAT)
    img = np.asarray(rgb)

    def probe_world(x, y):
        u = int(round(320 + f * (-y) / z))
        v = int(round(240 + f * (-x) / z))
        return img[v, u]

    # near the (+x,+y) corner (texture row 0, col 0 = red)
    c = probe_world(0.195, 0.345)
    assert c[0] > 0.5 and c[1] < 0.3, c
    c = probe_world(-0.195, -0.345)
    assert c[1] > 0.5 and c[0] < 0.3, c
    # off the poster in y but within a square of the x half-size -> background
    c = probe_world(0.0, 0.37)
    np.testing.assert_allclose(c, [0.5, 0.5, 0.5], atol=1e-6)


def test_bilinear_quad_gather_matches_naive_indexing():
    """The channel-packed single-gather bilinear sample (TPU gather-count
    optimization) must be bit-identical to naive 2-D advanced indexing,
    including edge clamping."""
    import jax.numpy as jnp
    from vitvs_tpu.sim.scene import _bilinear_sample

    r = np.random.default_rng(5)
    tex = jnp.asarray(r.random((37, 29, 3)), jnp.float32)
    rows = jnp.asarray(r.uniform(-1.5, 38.5, (50,)), jnp.float32)
    cols = jnp.asarray(r.uniform(-1.5, 30.5, (50,)), jnp.float32)

    def naive(tex, rows, cols):
        ht, wt, _ = tex.shape
        r0 = jnp.floor(rows); c0 = jnp.floor(cols)
        fr = (rows - r0)[..., None]; fc = (cols - c0)[..., None]
        r0 = jnp.clip(r0.astype(jnp.int32), 0, ht - 1)
        c0 = jnp.clip(c0.astype(jnp.int32), 0, wt - 1)
        r1 = jnp.clip(r0 + 1, 0, ht - 1)
        c1 = jnp.clip(c0 + 1, 0, wt - 1)
        top = tex[r0, c0] * (1 - fc) + tex[r0, c1] * fc
        bot = tex[r1, c0] * (1 - fc) + tex[r1, c1] * fc
        return top * (1 - fr) + bot * fr

    got = np.asarray(_bilinear_sample(tex, rows, cols))
    ref = np.asarray(naive(tex, rows, cols))
    np.testing.assert_array_equal(got, ref)


def test_organized_point_cloud_backprojection():
    """Cloud xyz must satisfy the pinhole relation of the reference plugin
    (gazebo_ros_realsense.cpp:105-193): x = d*(i-c)/fl with fl from the
    65-degree HFOV, principal point at (N-1)/2, NaN outside (near, far)."""
    from vitvs_tpu.sim import organized_point_cloud

    H, W = 6, 8
    d = np.full((H, W), 2.0, np.float32)
    d[0, 0] = 0.1    # below near cutoff
    d[1, 1] = 9.0    # beyond far cutoff
    rgb = np.arange(H * W * 3, dtype=np.float32).reshape(H, W, 3)
    cloud = np.asarray(organized_point_cloud(jnp.asarray(d), jnp.asarray(rgb)))
    assert cloud.shape == (H, W, 6)
    fl = W / (2.0 * np.tan(np.radians(65.0) / 2.0))
    # center-ish pixel: check the backprojection arithmetic exactly
    v, u = 3, 5
    assert np.isclose(cloud[v, u, 0], 2.0 * (u - 0.5 * (W - 1)) / fl)
    assert np.isclose(cloud[v, u, 1], 2.0 * (v - 0.5 * (H - 1)) / fl)
    assert np.isclose(cloud[v, u, 2], 2.0)
    # out-of-range depths -> NaN xyz, colors preserved (is_dense=false)
    assert np.isnan(cloud[0, 0, :3]).all() and np.isnan(cloud[1, 1, :3]).all()
    np.testing.assert_array_equal(cloud[..., 3:], rgb)
    # mono image broadcast + no-image zero fill
    mono = np.asarray(organized_point_cloud(jnp.asarray(d),
                                            jnp.asarray(rgb[..., 0])))
    np.testing.assert_array_equal(mono[..., 3], mono[..., 5])
    none = np.asarray(organized_point_cloud(jnp.asarray(d)))
    np.testing.assert_array_equal(none[..., 3:], 0.0)


def test_render_ir_stereo_pair():
    """IR emulation (scene.render_ir): ir1 is the BT.601 luma of the color
    render at the same pose; ir2 is the view from 50 mm right (stereo
    baseline _d435.urdf.xacro:20-21), so a fronto-parallel plane at depth Z
    appears shifted by the stereo disparity f*B/Z pixels."""
    from vitvs_tpu.sim import render_ir
    from vitvs_tpu.sim.scene import IR2_OFFSET_Y

    scene = _scene()
    ir1, ir2 = render_ir(scene, CAM, GOAL_POS, GOAL_QUAT)
    assert ir1.shape == (480, 640) and ir2.shape == (480, 640)
    # L_INT8 wire format: exact 8-bit levels
    a = np.asarray(ir1)
    np.testing.assert_allclose(a * 255, np.round(a * 255), atol=1e-4)
    # ir1 == luma of the color render at the same pose
    rgb, _ = render(scene, CAM, GOAL_POS, GOAL_QUAT)
    luma = np.asarray(rgb) @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(a, np.round(np.clip(luma, 0, 1) * 255) / 255,
                               atol=1e-6)
    # stereo disparity: looking straight down at the plane, depth is
    # uniform Z = 0.605, so ir2 is ir1 shifted by f*B/Z pixels
    disp = float(CAM.fx) * abs(IR2_OFFSET_Y) / 0.605   # ~41.5 px
    k = int(round(disp))
    b = np.asarray(ir2)
    # compare interior columns (texture-covered region away from edges)
    sl = np.s_[140:340, 200:440]
    shifted = np.abs(a[:, k:][sl] - b[:, :-k][sl]).mean()
    unshifted = np.abs(a[sl] - b[sl]).mean()
    assert shifted < 0.06, shifted            # sub-pixel residual only
    assert unshifted > 4 * shifted            # the shift is real


def test_render_ir_noise_gated_by_key():
    from vitvs_tpu.sim import render_ir

    scene = _scene()
    ir1a, _ = render_ir(scene, CAM, GOAL_POS, GOAL_QUAT)
    ir1b, _ = render_ir(scene, CAM, GOAL_POS, GOAL_QUAT)
    np.testing.assert_array_equal(np.asarray(ir1a), np.asarray(ir1b))
    ir1n, ir2n = render_ir(scene, CAM, GOAL_POS, GOAL_QUAT,
                           noise_key=jax.random.PRNGKey(3))
    d = np.abs(np.asarray(ir1n) - np.asarray(ir1a))
    # sigma=0.05 Gaussian (the plugin's SDF noise) -> mean |delta| ~ 0.04
    assert 0.01 < d.mean() < 0.1
    # the two IR sensors draw independent noise
    assert not np.array_equal(np.asarray(ir1n), np.asarray(ir2n))
