"""Closed-loop autopsy: run the classical servo loop on CPU with either the
repo's feature pipeline or cv2's reference implementation in the loop, on
identical episodes, and report per-step error trajectories.

Separates "our detector/matcher is the blocker" from "the control/sim
dynamics are the blocker": if cv2-in-the-loop converges where ours doesn't,
feature quality is the gap; if both fail, the loop semantics are.

Usage: python -u scripts/diag_closedloop.py [--n 8] [--steps 400] [--pipeline both]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--num-pairs", type=int, default=24)
    ap.add_argument("--max-corners", type=int, default=1152)
    ap.add_argument("--pipeline", default="both", choices=["ours", "cv2", "both"])
    ap.add_argument("--method", default="sift")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from vitvs_tpu.classical.features import grayscale, match_descriptors
    from vitvs_tpu.classical.pipeline import METHOD_NORMS, extract_features
    from vitvs_tpu.control import (body_twist_from_optical, depth_at_points,
                                   ibvs_velocity)
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
    goal_gray = np.asarray(grayscale(goal_rgb))
    goal_u8 = (goal_gray * 255).astype(np.uint8)

    gf = extract_features(model, jnp.asarray(goal_gray), args.max_corners,
                          args.method)
    det = cv2.SIFT_create() if args.method == "sift" else cv2.ORB_create(nfeatures=1000)
    norm = cv2.NORM_L2 if args.method == "sift" else cv2.NORM_HAMMING
    bf = cv2.BFMatcher(norm, crossCheck=True)
    kp_g, des_g = det.detectAndCompute(goal_u8, None)
    uv_g_all = np.float32([kp.pt for kp in kp_g])

    positions, quats, _ = samplers.generate_episode_starts(
        cfg.replace(num_samples=args.n))

    obs_j = jax.jit(lambda p, q: observe(scene, cam, p, q))
    step_j = jax.jit(env_step)

    def solve(uv_star, uv, depth):
        s_xy = cam.pixel_to_normalized(jnp.asarray(uv, jnp.float32))
        s_star_xy = cam.pixel_to_normalized(jnp.asarray(uv_star, jnp.float32))
        Z = depth_at_points(depth, jnp.asarray(uv, jnp.float32))
        return ibvs_velocity(s_xy, s_star_xy, Z, cfg.lambda_,
                             mode="dls", damping=cfg.pinv_damping)

    def run_episode(i, use_cv2):
        pos = jnp.asarray(positions[i], jnp.float32)
        quat = jnp.asarray(quats[i], jnp.float32)
        e0 = float(jnp.linalg.norm(pos - gp))
        ema = None
        v_prev = np.zeros(6, np.float32)
        errs = [e0]
        for t in range(args.steps):
            rgb, depth = obs_j(pos, quat)
            if use_cv2:
                u8 = (np.asarray(grayscale(rgb)) * 255).astype(np.uint8)
                kp_c, des_c = det.detectAndCompute(u8, None)
                v_raw = None
                if des_c is not None and len(kp_c) >= 4:
                    ms = bf.match(des_g, des_c)
                    ms = sorted(ms, key=lambda mm: mm.distance)[:args.num_pairs]
                    if len(ms) >= 4:
                        uv_star = uv_g_all[[mm.queryIdx for mm in ms]]
                        uv = np.float32([kp_c[mm.trainIdx].pt for mm in ms])
                        v_raw = np.asarray(solve(np.round(uv_star),
                                                 np.round(uv), depth))
            else:
                g = grayscale(jnp.asarray(rgb, jnp.float32))
                cf = extract_features(model, g, args.max_corners, args.method)
                m = match_descriptors(gf.desc, cf.desc, gf.valid, cf.valid,
                                      args.num_pairs,
                                      norm=METHOD_NORMS[args.method])
                v_raw = None
                if int(m.num_valid) >= 4:
                    uv_star = np.asarray(gf.uv)[np.asarray(m.idx1)]
                    uv = np.asarray(cf.uv)[np.asarray(m.idx2)]
                    val = np.asarray(m.valid)
                    uv_star, uv = uv_star[val], uv[val]
                    v_raw = np.asarray(solve(np.round(uv_star),
                                             np.round(uv), depth))
            if v_raw is None:
                v_c = v_prev
            else:
                ema = v_raw if ema is None else (cfg.ema_alpha * ema
                                                 + (1 - cfg.ema_alpha) * v_raw)
                v_c = ema
            v_prev = v_c
            body = body_twist_from_optical(jnp.asarray(v_c), cfg.max_velocity)
            pos, quat = step_j(pos, quat, body, cfg.control_dt)
            errs.append(float(jnp.linalg.norm(pos - gp)))
            if errs[-1] > 5 * e0:
                break
        errs = np.array(errs)
        return e0, errs

    for i in range(args.n):
        line = f"ep {i:2d}"
        for use_cv2 in ([False, True] if args.pipeline == "both"
                        else [args.pipeline == "cv2"]):
            e0, errs = run_episode(i, use_cv2)
            tag = "cv2 " if use_cv2 else "ours"
            final = errs[-1]
            lowest = errs.min()
            status = ("DIV" if final > 5 * e0 else
                      "conv" if lowest < 0.02 else "wander")
            line += (f"   [{tag}] e0 {e0*100:5.1f}cm -> low {lowest*100:6.2f}cm"
                     f" final {final*100:6.2f}cm {status} ({len(errs)-1} steps)")
        print(line, flush=True)


if __name__ == "__main__":
    main()
