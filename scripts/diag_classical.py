"""Diagnose classical matching quality on the benchmark scene.

For start poses drawn from the real benchmark distribution, renders the
goal and start views, extracts+matches features with (a) the repo's
classical pipeline and (b) OpenCV's reference implementations
(cv2.SIFT/ORB + BFMatcher crossCheck — exactly what ibvs_standard.py:336-362
runs), then scores the selected top-`num_pairs` matches against the
ground-truth plane-induced correspondence.

Usage: python -u scripts/diag_classical.py [--n 16] [--method sift]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gt_project(cam, pos_a, quat_a, pos_b, quat_b, plane_z, uv_a):
    """Ground-truth pixel correspondence view A -> view B via the plane."""
    from vitvs_tpu.core.camera import reproject_via_plane

    uv_b, _, _, _ = reproject_via_plane(cam, uv_a, pos_a, quat_a,
                                        pos_b, quat_b, plane_z)
    return np.asarray(uv_b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--method", default="sift", choices=["sift", "orb", "harris"])
    ap.add_argument("--num-pairs", type=int, default=24)
    ap.add_argument("--max-corners", type=int, default=1152)
    ap.add_argument("--tol", type=float, default=8.0, help="inlier px tol")
    ap.add_argument("--poster", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from vitvs_tpu.classical.features import grayscale, match_descriptors
    from vitvs_tpu.classical.pipeline import METHOD_NORMS, extract_features
    from vitvs_tpu.harness import samplers
    from vitvs_tpu.harness.pipeline import ServoModel
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import load_poster_scene, observe

    cfg = VSConfig()
    model = ServoModel.create(cfg, compute_dtype=jnp.float32)
    scene = load_poster_scene(args.poster)
    cam = model.camera
    plane_z = float(scene.plane_z)

    gp = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    gq = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)
    goal_rgb, _ = observe(scene, cam, gp, gq)
    goal_gray = np.asarray(grayscale(goal_rgb))
    goal_u8 = (goal_gray * 255).astype(np.uint8)

    positions, quats, _ = samplers.generate_episode_starts(
        cfg.replace(num_samples=args.n))

    # repo pipeline goal features
    gf = extract_features(model, jnp.asarray(goal_gray), args.max_corners,
                          args.method)

    # cv2 oracle
    if args.method == "orb":
        det = cv2.ORB_create(nfeatures=1000)
        bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    else:
        det = cv2.SIFT_create()
        bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
    kp_g, des_g = det.detectAndCompute(goal_u8, None)

    def spin_deg(q):
        # in-plane rotation magnitude of start vs goal (optical-axis spin)
        from vitvs_tpu.core import se3 as s3
        r = np.asarray(s3.matrix_from_quat(jnp.asarray(q)))
        rg = np.asarray(s3.matrix_from_quat(gq))
        rel = rg.T @ r
        return np.degrees(np.arctan2(rel[1, 0] - rel[0, 1],
                                     rel[0, 0] + rel[1, 1]))

    rows = []
    for i in range(args.n):
        sp = jnp.asarray(positions[i], jnp.float32)
        sq = jnp.asarray(quats[i], jnp.float32)
        rgb, _ = observe(scene, cam, sp, sq)
        gray = np.asarray(grayscale(rgb))
        u8 = (gray * 255).astype(np.uint8)

        # --- repo pipeline
        cf = extract_features(model, jnp.asarray(gray), args.max_corners,
                              args.method)
        m = match_descriptors(gf.desc, cf.desc, gf.valid, cf.valid,
                              args.num_pairs, norm=METHOD_NORMS[args.method])
        uv_goal = np.asarray(gf.uv)[np.asarray(m.idx1)]
        uv_cur = np.asarray(cf.uv)[np.asarray(m.idx2)]
        valid = np.asarray(m.valid)
        gt = gt_project(cam, np.asarray(gp), np.asarray(gq), np.asarray(sp),
                        np.asarray(sq), plane_z, uv_goal)
        err = np.linalg.norm(gt - uv_cur, axis=-1)
        ours_inlier = float(np.mean(err[valid] < args.tol)) if valid.any() else 0.0
        ours_n = int(valid.sum())

        # --- cv2 oracle
        kp_c, des_c = det.detectAndCompute(u8, None)
        cv_inlier, cv_n = 0.0, 0
        if des_g is not None and des_c is not None and len(kp_c) >= 2:
            matches = bf.match(des_g, des_c)
            matches = sorted(matches, key=lambda mm: mm.distance)[:args.num_pairs]
            if matches:
                uv_g = np.float32([kp_g[mm.queryIdx].pt for mm in matches])
                uv_c = np.float32([kp_c[mm.trainIdx].pt for mm in matches])
                gt2 = gt_project(cam, np.asarray(gp), np.asarray(gq),
                                 np.asarray(sp), np.asarray(sq), plane_z, uv_g)
                err2 = np.linalg.norm(gt2 - uv_c, axis=-1)
                cv_inlier = float(np.mean(err2 < args.tol))
                cv_n = len(matches)

        rows.append((i, spin_deg(sq), ours_n, ours_inlier, cv_n, cv_inlier))
        print(f"ep {i:3d} spin {rows[-1][1]:+7.1f}deg  "
              f"ours {ours_n:2d} pairs inlier {ours_inlier:.2f}   "
              f"cv2 {cv_n:2d} pairs inlier {cv_inlier:.2f}", flush=True)

    a = np.array([[r[3], r[5]] for r in rows])
    print(f"\nmean inlier rate: ours {a[:,0].mean():.3f}  cv2 {a[:,1].mean():.3f}")
    small = np.array([r for r in rows if abs(r[1]) < 45])
    big = np.array([r for r in rows if abs(r[1]) >= 45])
    if len(small):
        print(f"spin <45deg : ours {small[:,3].mean():.3f}  cv2 {small[:,5].mean():.3f} (n={len(small)})")
    if len(big):
        print(f"spin >=45deg: ours {big[:,3].mean():.3f}  cv2 {big[:,5].mean():.3f} (n={len(big)})")


if __name__ == "__main__":
    main()


def height_sweep():
    """Static matching quality vs camera height (the retreat transient's
    scale axis): python -c 'import scripts.diag_classical as d; d.height_sweep()'"""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from vitvs_tpu.classical.features import grayscale, match_descriptors
    from vitvs_tpu.classical.pipeline import METHOD_NORMS, extract_features
    from vitvs_tpu.harness import samplers
    from vitvs_tpu.harness.pipeline import ServoModel
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import load_poster_scene, observe

    cfg = VSConfig()
    model = ServoModel.create(cfg, compute_dtype=jnp.float32)
    scene = load_poster_scene()
    cam = model.camera
    gp = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    gq = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)
    goal_rgb, _ = observe(scene, cam, gp, gq)
    goal_gray = np.asarray(grayscale(goal_rgb))
    gf = extract_features(model, jnp.asarray(goal_gray), 1152, "sift")
    det = cv2.SIFT_create()
    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
    kp_g, des_g = det.detectAndCompute((goal_gray*255).astype(np.uint8), None)

    for h in [0.61, 0.8, 1.0, 1.2, 1.4, 1.6, 1.8]:
        sp = jnp.array([0.0, 0.0, h], jnp.float32)
        rgb, _ = observe(scene, cam, sp, gq)
        gray = np.asarray(grayscale(rgb))
        cf = extract_features(model, jnp.asarray(gray), 1152, "sift")
        m = match_descriptors(gf.desc, cf.desc, gf.valid, cf.valid, 24,
                              norm="l2")
        uv_g = np.asarray(gf.uv)[np.asarray(m.idx1)]
        uv_c = np.asarray(cf.uv)[np.asarray(m.idx2)]
        val = np.asarray(m.valid)
        gt = gt_project(cam, np.asarray(gp), np.asarray(gq), np.asarray(sp),
                        np.asarray(gq), float(scene.plane_z), uv_g)
        err = np.linalg.norm(gt - uv_c, axis=-1)
        ours = float(np.mean(err[val] < 8)) if val.any() else 0.0

        kp_c, des_c = det.detectAndCompute((gray*255).astype(np.uint8), None)
        cvr = 0.0
        if des_c is not None and len(kp_c) >= 2:
            ms = sorted(bf.match(des_g, des_c), key=lambda mm: mm.distance)[:24]
            if ms:
                ug = np.float32([kp_g[mm.queryIdx].pt for mm in ms])
                uc = np.float32([kp_c[mm.trainIdx].pt for mm in ms])
                gt2 = gt_project(cam, np.asarray(gp), np.asarray(gq),
                                 np.asarray(sp), np.asarray(gq),
                                 float(scene.plane_z), ug)
                cvr = float(np.mean(np.linalg.norm(gt2-uc, axis=-1) < 8))
        print(f"h {h:.2f} (scale {h/0.61:.2f}x): ours {ours:.2f}  cv2 {cvr:.2f}",
              flush=True)
