"""Counterfactual velocity test on one frame: does removing match outliers
fix the velocity direction?

For a chosen episode's start frame, computes the IBVS velocity three ways:
  (a) the pipeline's top-24 matches as-is,
  (b) the same matches with ground-truth outliers (>8 px) removed,
  (c) 24 perfect ground-truth correspondences at the same goal points,
and reports each velocity's alignment with the goal direction after one
env_step.  Isolates "outliers corrupt the solve" from "the control law is
wrong for this geometry".

Usage: python -u scripts/diag_counterfactual.py --episode 3 [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episode", type=int, default=3)
    ap.add_argument("--method", default="sift")
    ap.add_argument("--max-corners", type=int, default=1152)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vitvs_tpu.classical.features import grayscale, match_descriptors
    from vitvs_tpu.classical.pipeline import METHOD_NORMS, extract_features
    from vitvs_tpu.control import (body_twist_from_optical, depth_at_points,
                                   ibvs_velocity)
    from vitvs_tpu.core import se3
    from vitvs_tpu.harness import samplers
    from vitvs_tpu.harness.pipeline import ServoModel
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import env_step, load_poster_scene, observe

    cfg = VSConfig()
    model = ServoModel.create(cfg, compute_dtype=jnp.float32)
    scene = load_poster_scene()
    cam = model.camera

    gp = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    gq = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)
    goal_rgb, _ = observe(scene, cam, gp, gq)
    gf = extract_features(model, grayscale(goal_rgb), args.max_corners,
                          args.method)

    positions, quats, _ = samplers.generate_episode_starts(cfg)
    pos = jnp.asarray(positions[args.episode], jnp.float32)
    quat = jnp.asarray(quats[args.episode], jnp.float32)
    rgb, depth = observe(scene, cam, pos, quat)
    cf = extract_features(model, grayscale(rgb), args.max_corners, args.method)
    m = match_descriptors(gf.desc, cf.desc, gf.valid, cf.valid, cfg.num_pairs,
                          norm=METHOD_NORMS[args.method])

    uv_star = np.asarray(gf.uv)[np.asarray(m.idx1)]
    uv_cur = np.asarray(cf.uv)[np.asarray(m.idx2)]
    val = np.asarray(m.valid)

    def gt_uv(uv_goal):
        from vitvs_tpu.core.camera import reproject_via_plane

        uv_b, _, _, _ = reproject_via_plane(cam, uv_goal, gp, gq,
                                            pos, quat, scene.plane_z)
        return np.asarray(uv_b)

    gt = gt_uv(uv_star)
    err_px = np.linalg.norm(gt - uv_cur, axis=-1)
    inlier = val & (err_px < 8)
    print(f"episode {args.episode}: {val.sum()} matches, "
          f"{inlier.sum()} inliers, outlier px errors: "
          f"{np.sort(err_px[val & ~inlier]).astype(int)}")

    def velocity(uv_s, uv_c, mask):
        s_xy = cam.pixel_to_normalized(jnp.asarray(np.round(uv_c), jnp.float32))
        s_star_xy = cam.pixel_to_normalized(jnp.asarray(np.round(uv_s), jnp.float32))
        Z = depth_at_points(depth, jnp.asarray(np.round(uv_c), jnp.float32))
        return ibvs_velocity(s_xy, s_star_xy, Z, cfg.lambda_,
                             valid=jnp.asarray(mask), mode="dls",
                             damping=cfg.pinv_damping)

    def report(tag, v_raw):
        body = body_twist_from_optical(v_raw, cfg.max_velocity)
        npos, _ = env_step(pos, quat, body, cfg.control_dt)
        d = np.asarray(npos - pos)
        to_goal = np.asarray(gp - pos)
        aligned = float(np.dot(d, to_goal) /
                        (np.linalg.norm(d) * np.linalg.norm(to_goal) + 1e-12))
        print(f"{tag:28s} |v| {float(jnp.linalg.norm(v_raw)):.4f} "
              f"align {aligned:+.3f}  v {np.round(np.asarray(v_raw), 4)}")

    report("(a) all matches", velocity(uv_star, uv_cur, val))
    report("(b) inliers only", velocity(uv_star, uv_cur, inlier))
    # (c) perfect correspondences at the same goal points
    report("(c) ground-truth matches", velocity(uv_star, gt, val))


if __name__ == "__main__":
    main()
