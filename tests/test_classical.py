"""Classical feature pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from vitvs_tpu.classical import (
    detect_corners,
    grayscale,
    harris_response,
    match_descriptors,
    sift_like_descriptors,
)
from vitvs_tpu.classical.pipeline import classical_servo_step, extract_goal_features
from vitvs_tpu.control import EmaState
from vitvs_tpu.harness.pipeline import ServoModel
from vitvs_tpu.harness.rollout import pose_errors, rollout_episode
from vitvs_tpu.io_bridge.config import VSConfig
from vitvs_tpu.models import vit as vit_mod
from vitvs_tpu.sim import Scene, make_synthetic_poster, observe

RNG = np.random.default_rng(41)

GOAL_POS = jnp.array([0.0, 0.0, 0.61])
GOAL_QUAT = jnp.array([0.0, 0.7071068, 0.0, 0.7071068])


def _squares_image(h=96, w=96):
    """Sparse solid squares: L-corners with strong positive Harris response
    (checkerboard X-corners are saddles with NEGATIVE response)."""
    img = np.zeros((h, w), np.float32)
    for (r, c) in [(20, 20), (20, 60), (60, 20), (60, 60)]:
        img[r:r + 16, c:c + 16] = 1.0
    return img


def test_grayscale_weights():
    rgb = jnp.asarray(RNG.random((8, 8, 3)).astype(np.float32))
    g = np.asarray(grayscale(rgb))
    ref = np.asarray(rgb) @ np.array([0.299, 0.587, 0.114])
    np.testing.assert_allclose(g, ref, atol=1e-6)


def test_harris_peaks_at_corners():
    img = jnp.asarray(_squares_image())
    r = np.asarray(harris_response(img))
    # square corner region: strong positive response; flat regions ~ 0
    corner_region = r[17:25, 17:25].max()
    flat_val = abs(r[28, 44])
    assert corner_region > 1e-2
    assert corner_region > 100 * flat_val


def test_detect_corners_on_squares():
    img = jnp.asarray(_squares_image())
    c = detect_corners(img, max_corners=64, border=4)
    uv = np.asarray(c.uv)[np.asarray(c.valid)]
    assert len(uv) >= 8  # 4 squares x 4 corners, minus NMS/threshold slack
    # every detection lies near one of the 16 true square corners
    true = np.array([[cc + d, rr + e] for rr in (20, 60) for cc in (20, 60)
                     for d in (0, 15) for e in (0, 15)], np.float32)
    dists = np.linalg.norm(uv[:, None, :] - true[None, :, :], axis=-1).min(1)
    assert (dists <= 4.0).mean() > 0.8


def test_descriptor_rotation_tolerance():
    """The same corner viewed under a 90-deg rotated image should produce a
    similar descriptor (dominant-orientation normalization)."""
    img = np.asarray(make_synthetic_poster(128, seed=5))
    g = np.asarray(grayscale(jnp.asarray(img)))
    g_rot = np.rot90(g, k=1).copy()
    pt = np.array([[40.0, 56.0]])  # (u, v)
    d1 = np.asarray(sift_like_descriptors(jnp.asarray(g), jnp.asarray(pt, jnp.float32)))
    # np.rot90(k=1): out[r, c] = in[c, W-1-r]  =>  (u, v) -> (u', v') = (v, W-1-u)
    pt_rot = np.array([[pt[0, 1], 127 - pt[0, 0]]])
    d2 = np.asarray(sift_like_descriptors(jnp.asarray(g_rot),
                                          jnp.asarray(pt_rot, jnp.float32)))
    cos = float((d1 @ d2.T).item() / (np.linalg.norm(d1) * np.linalg.norm(d2) + 1e-12))
    assert cos > 0.6, cos
    # same-image self-similarity sanity
    d3 = np.asarray(sift_like_descriptors(jnp.asarray(g), jnp.asarray(pt, jnp.float32)))
    assert float((d1 @ d3.T).item()) > 0.999


def test_match_descriptors_identity_and_crosscheck():
    d = RNG.standard_normal((32, 16)).astype(np.float32)
    valid = jnp.ones(32, bool)
    m = match_descriptors(jnp.asarray(d), jnp.asarray(d), valid, valid, 10)
    assert int(m.num_valid) == 10
    np.testing.assert_array_equal(np.asarray(m.idx1), np.asarray(m.idx2))
    np.testing.assert_allclose(np.asarray(m.distance)[np.asarray(m.valid)], 0, atol=1e-3)


def test_match_fewer_than_requested():
    d1 = RNG.standard_normal((6, 8)).astype(np.float32)
    d2 = RNG.standard_normal((6, 8)).astype(np.float32)
    v = jnp.ones(6, bool)
    m = match_descriptors(jnp.asarray(d1), jnp.asarray(d2), v, v, 24)
    assert m.idx1.shape == (24,)
    assert int(m.num_valid) <= 6


def _classical_model(**kw):
    cfg = VSConfig(u_max=128, v_max=128, f_x=100.5, f_y=100.5,
                   num_pairs=16, lambda_=0.5, control_dt=0.1,
                   ema_alpha=0.8, pinv_mode="dls",
                   divergence_multiplier=5.0, max_iterations=120, **kw)
    vcfg = vit_mod.ViTConfig(model_name="unused")
    return ServoModel(vit=vcfg, cfg=cfg, compute_dtype=jnp.float32)


def test_classical_closed_loop_converges():
    # 'harris' = the single-scale corner variant; the DoG/binary families
    # have their own cross-view match test below (they need more resolution
    # than this 128^2 smoke scene)
    model = _classical_model()
    scene = Scene.create(make_synthetic_poster(256, seed=3), half_size=0.42)
    goal_rgb, _ = observe(scene, model.camera, GOAL_POS, GOAL_QUAT)
    gf = extract_goal_features(model, goal_rgb, max_corners=256,
                               method="harris")

    start = GOAL_POS + jnp.asarray([0.10, -0.08, 0.15], jnp.float32)
    e0t, _ = pose_errors(start, GOAL_QUAT, GOAL_POS, GOAL_QUAT)

    def step_fn(rgb, depth, ema, prev_v, key):
        return classical_servo_step(model, gf, rgb, depth, ema, prev_v, key,
                                    max_corners=256, method="harris")

    run = jax.jit(lambda sp, sq, k: rollout_episode(
        None, model, scene, None, sp, sq, k, num_steps=120, step_fn=step_fn))
    res = run(start, GOAL_QUAT, jax.random.PRNGKey(0))
    et = float(res.error_history[-1, 0])
    assert et < 0.5 * float(e0t), (et, float(e0t))


# ---------------------------------------------------------------------------
# Scale-space SIFT + binary families (r2: the reference's three-method axis,
# ibvs_standard.py:336-347)

def _two_views(seed=3, spin_deg=20.0, offset=(0.30, -0.25, 0.20)):
    from vitvs_tpu.core.camera import CameraIntrinsics
    from vitvs_tpu.core import se3

    cam = CameraIntrinsics(width=320, height=240, fx=251.15, fy=251.15)
    scene = Scene.create(make_synthetic_poster(512, seed=seed))
    rgb1, _ = observe(scene, cam, GOAL_POS, GOAL_QUAT)
    q2 = se3.rotate_about_body_x(GOAL_QUAT, jnp.radians(spin_deg))
    p2 = GOAL_POS + jnp.asarray(offset, jnp.float32)
    rgb2, _ = observe(scene, cam, p2, q2)
    g1 = grayscale(rgb1.astype(jnp.float32))
    g2 = grayscale(rgb2.astype(jnp.float32))
    return cam, scene, (GOAL_POS, GOAL_QUAT, g1), (p2, q2, g2)


def _gt_reproject(cam, p1, q1, uv1, p2, q2, plane_z=0.005):
    """Exact plane homography: view-1 pixels -> view-2 pixels."""
    from vitvs_tpu.core import se3

    def R_wc(quat):
        return np.asarray(se3.matrix_from_quat(jnp.asarray(quat))
                          @ se3.R_BODY_FROM_OPTICAL)

    R1 = R_wc(q1)
    d_c = np.stack([(uv1[:, 0] - cam.width / 2) / cam.fx,
                    (uv1[:, 1] - cam.height / 2) / cam.fy,
                    np.ones(len(uv1))], 1)
    d_w = d_c @ R1.T
    t = (plane_z - float(p1[2])) / d_w[:, 2]
    world = np.asarray(p1) + t[:, None] * d_w
    R2 = R_wc(q2)
    c = (world - np.asarray(p2)) @ R2
    return np.stack([cam.fx * c[:, 0] / c[:, 2] + cam.width / 2,
                     cam.fy * c[:, 1] / c[:, 2] + cam.height / 2], 1)


def test_sift_features_shapes_and_validity():
    from vitvs_tpu.classical import sift_features

    _, _, (_, _, g1), _ = _two_views()
    f = sift_features(g1, 384)
    assert f.uv.shape == (384, 2) and f.desc.shape == (384, 128)
    assert int(f.valid.sum()) > 50
    # descriptors are L2-normalized with the 0.2 clip
    n = np.linalg.norm(np.asarray(f.desc)[np.asarray(f.valid)], axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_orb_akaze_binary_descriptors():
    from vitvs_tpu.classical import akaze_features, orb_features

    _, _, (_, _, g1), _ = _two_views()
    fo = orb_features(g1, 400)
    fa = akaze_features(g1, 256)
    assert fo.desc.shape == (400, 256) and fo.desc.dtype == jnp.int8
    assert fa.desc.shape == (256, 486) and fa.desc.dtype == jnp.int8
    for f in (fo, fa):
        vals = np.unique(np.asarray(f.desc))
        assert set(vals.tolist()) <= {0, 1}
        # bits are informative (not constant)
        frac = np.asarray(f.desc)[np.asarray(f.valid)].mean()
        assert 0.2 < frac < 0.8, frac


def test_hamming_matching_identity():
    d = jnp.asarray((RNG.random((64, 256)) > 0.5).astype(np.int8))
    v = jnp.ones(64, bool)
    m = match_descriptors(d, d, v, v, 16, norm="hamming")
    assert int(m.num_valid) == 16
    np.testing.assert_array_equal(np.asarray(m.idx1), np.asarray(m.idx2))
    np.testing.assert_allclose(np.asarray(m.distance)[np.asarray(m.valid)], 0)


def test_all_methods_match_across_views():
    """Every family must produce mostly-correct top-24 matches between two
    benchmark-like views (checked against the exact plane homography)."""
    from vitvs_tpu.classical import akaze_features, orb_features, sift_features
    from vitvs_tpu.classical.pipeline import METHOD_NORMS

    cam, _, (p1, q1, g1), (p2, q2, g2) = _two_views()
    fams = {
        "sift": lambda g: sift_features(g, 1152),
        "orb": lambda g: orb_features(g, 600),
        "akaze": lambda g: akaze_features(g, 384),
    }
    for name, fn in fams.items():
        f1, f2 = fn(g1), fn(g2)
        m = match_descriptors(f1.desc, f2.desc, f1.valid, f2.valid, 24,
                              norm=METHOD_NORMS[name])
        sel = np.asarray(m.valid)
        uv1 = np.asarray(f1.uv)[np.asarray(m.idx1)][sel]
        uv2 = np.asarray(f2.uv)[np.asarray(m.idx2)][sel]
        gt2 = _gt_reproject(cam, p1, q1, uv1, p2, q2)
        err = np.linalg.norm(uv2 - gt2, axis=1)
        inliers = (err < 8.0).mean()
        assert int(m.num_valid) >= 12, (name, int(m.num_valid))
        assert inliers > 0.5, (name, inliers, np.median(err))


def test_subpixel_refinement_bounded():
    """DoG subpixel offsets stay within +/-0.5 px of the integer extremum."""
    from vitvs_tpu.classical.scalespace import _gauss_stack, _octave_extrema

    _, _, (_, _, g1), _ = _two_views()
    gauss, _ = _gauss_stack(g1, 3)
    dog = gauss[1:] - gauss[:-1]
    score, oy, ox = _octave_extrema(dog, 0.008, 10.0, 8)
    sel = np.isfinite(np.asarray(score))
    assert sel.sum() > 0
    assert np.abs(np.asarray(ox)[sel]).max() <= 0.5 + 1e-6
    assert np.abs(np.asarray(oy)[sel]).max() <= 0.5 + 1e-6


def test_detection_quality_robust_to_approx_topk_recall():
    """The TPU default detector uses lax.approx_max_k (~0.95 recall of the
    exact top-K; classical/features.top_k_scores).  CPU lowers approx_max_k
    to the exact reduction, so this test bounds the CLAIM instead: dropping
    a random 5% of detected corners (emulating 0.95 recall) must not
    degrade the top-24 match set below the closed-loop operating point."""
    from vitvs_tpu.classical.features import grayscale, match_descriptors
    from vitvs_tpu.classical.pipeline import METHOD_RATIOS, extract_features
    from vitvs_tpu.harness.pipeline import ServoModel
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import load_poster_scene, observe

    cfg = VSConfig()
    model = ServoModel.create(cfg, compute_dtype=jnp.float32)
    scene = load_poster_scene()
    gp = jnp.asarray([0.0, 0.0, 0.61], jnp.float32)
    gq = jnp.asarray([0.0, 0.7071068, 0.0, 0.7071068], jnp.float32)
    goal_rgb, _ = observe(scene, model.camera, gp, gq)
    rgb, _ = observe(scene, model.camera,
                     gp + jnp.asarray([0.05, -0.04, 0.12]), gq)
    gf = extract_features(model, grayscale(goal_rgb), 576, "sift")
    cf = extract_features(model, grayscale(rgb), 576, "sift")

    def top24_set(valid_mask):
        m = match_descriptors(gf.desc, cf.desc, gf.valid & valid_mask,
                              cf.valid, 24, norm="l2",
                              ratio=METHOD_RATIOS["sift"])
        return int(m.num_valid), np.asarray(gf.uv)[np.asarray(m.idx1)][
            np.asarray(m.valid)]

    n_full, uv_full = top24_set(jnp.ones(576, bool))
    rng = np.random.default_rng(7)
    drop = jnp.asarray(rng.random(576) > 0.05)   # keep 95%
    n_drop, uv_drop = top24_set(drop)

    assert n_full >= 16
    assert n_drop >= 12  # still far above the >=4 feature-ok floor
    # the surviving selection overlaps heavily with the full selection
    full_set = {tuple(p) for p in np.round(uv_full).tolist()}
    kept = sum(tuple(p) in full_set for p in np.round(uv_drop).tolist())
    assert kept / max(n_drop, 1) > 0.6


def test_diffusion_boundaries_do_not_wrap():
    """The AKAZE nonlinear scale space must use reflecting (edge-clamped)
    boundaries: with jnp.roll it was periodic, so a bright feature on one
    image edge leaked into responses near the OPPOSITE edge."""
    from vitvs_tpu.classical.binary import _diffuse, _hessian_det

    img = jnp.zeros((64, 64), jnp.float32).at[:, :2].set(1.0)  # left bar
    L = _diffuse(img, steps=18)
    right = np.asarray(L[:, -6:])
    # periodic wrap would smear ~1 px/step of the bar into the right edge;
    # reflecting boundaries keep it exactly zero
    assert np.abs(right).max() == 0.0, np.abs(right).max()
    resp = np.asarray(_hessian_det(jnp.asarray(L), 1.0))
    assert np.abs(resp[:, -6:]).max() == 0.0


def test_akaze_matches_under_large_spin():
    """M-LDB's gradient channels must be rotated into the keypoint frame
    (AKAZE's MLDB_Fill_Values): without that, matching collapses beyond
    ~25 deg of in-plane spin (run N failure clustering, TASK_VALIDATION).
    40 deg sits in the regime the bug loses."""
    from vitvs_tpu.classical import akaze_features
    from vitvs_tpu.classical.pipeline import METHOD_NORMS

    cam, _, (p1, q1, g1), (p2, q2, g2) = _two_views(
        spin_deg=40.0, offset=(0.10, -0.08, 0.05))
    f1, f2 = akaze_features(g1, 384), akaze_features(g2, 384)
    m = match_descriptors(f1.desc, f2.desc, f1.valid, f2.valid, 24,
                          norm=METHOD_NORMS["akaze"])
    sel = np.asarray(m.valid)
    uv1 = np.asarray(f1.uv)[np.asarray(m.idx1)][sel]
    uv2 = np.asarray(f2.uv)[np.asarray(m.idx2)][sel]
    gt2 = _gt_reproject(cam, p1, q1, uv1, p2, q2)
    err = np.linalg.norm(uv2 - gt2, axis=1)
    assert int(m.num_valid) >= 12
    assert (err < 8.0).mean() > 0.5, ((err < 8.0).mean(), np.median(err))
