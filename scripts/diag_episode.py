"""Per-step trace of a single classical episode, executed as jitted scan
segments on device (a per-step host loop is ~1 s/step through the axon
tunnel; a 50-step scan segment is one device program).

Logs per step: position error, #valid matches, match inlier rate vs the
ground-truth plane correspondence, velocity alignment with the goal
direction.  Used to autopsy the classical benchmark's wander/divergence
failure modes.

Usage: python -u scripts/diag_episode.py --episode 3 [--steps 250]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episode", type=int, default=3)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--segment", type=int, default=50)
    ap.add_argument("--log-every", type=int, default=5)
    ap.add_argument("--method", default="sift")
    ap.add_argument("--max-corners", type=int, default=1152)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vitvs_tpu.classical.pipeline import (classical_servo_step,
                                              extract_goal_features)
    from vitvs_tpu.control import EmaState
    from vitvs_tpu.core import se3
    from vitvs_tpu.harness import samplers
    from vitvs_tpu.harness.pipeline import ServoModel
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import env_step, load_poster_scene, observe

    cfg = VSConfig(divergence_multiplier=5.0)
    model = ServoModel.create(cfg, compute_dtype=jnp.float32)
    model = ServoModel(vit=model.vit, cfg=cfg, compute_dtype=jnp.float32)
    scene = load_poster_scene()
    cam = model.camera

    gp = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    gq = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)
    goal_rgb, _ = observe(scene, cam, gp, gq)
    gf = extract_goal_features(model, goal_rgb, args.max_corners, args.method)

    positions, quats, _ = samplers.generate_episode_starts(cfg)
    pos = jnp.asarray(positions[args.episode], jnp.float32)
    quat = jnp.asarray(quats[args.episode], jnp.float32)

    @jax.jit
    def segment(scene, gfa, carry):
        def body(c, _):
            pos, quat, ema_v, ema_i, prev_v = c
            rgb, depth = observe(scene, cam, pos, quat)
            res = classical_servo_step(model, gfa, rgb, depth,
                                       EmaState(ema_v, ema_i), prev_v,
                                       jax.random.PRNGKey(0),
                                       args.max_corners, method=args.method)
            npos, nquat = env_step(pos, quat, res.body_twist, cfg.control_dt)
            out = dict(pos=pos, quat=quat, v_c=res.v_c,
                       num_valid=res.num_valid, mean_sim=res.mean_sim,
                       s_uv=res.s_uv, s_uv_star=res.s_uv_star,
                       valid=res.valid, npos=npos)
            return ((npos, nquat, res.ema.value, res.ema.initialized,
                     res.v_c), out)

        return jax.lax.scan(body, carry, None, length=args.segment)

    def gt_uv(uv_goal, p, q):
        from vitvs_tpu.core.camera import reproject_via_plane

        uv_b, _, _, _ = reproject_via_plane(cam, uv_goal, gp, gq,
                                            p, q, scene.plane_z)
        return np.asarray(uv_b)

    carry = (pos, quat, jnp.zeros(6), jnp.zeros((), bool), jnp.zeros(6))
    e0 = float(jnp.linalg.norm(pos - gp))
    print(f"episode {args.episode}: e0 {e0*100:.1f} cm", flush=True)
    gpn = np.asarray(gp)
    for s0 in range(0, args.steps, args.segment):
        carry, ys = segment(scene, gf, carry)
        ys = jax.tree.map(np.asarray, ys)
        for t in range(0, args.segment, args.log_every):
            k = s0 + t
            p, q = ys["pos"][t], ys["quat"][t]
            gt = gt_uv(ys["s_uv_star"][t], p, q)
            err_px = np.linalg.norm(gt - ys["s_uv"][t], axis=-1)
            val = ys["valid"][t]
            inl = float((err_px[val] < 8).mean()) if val.any() else 0.0
            perr = np.linalg.norm(p - gpn)
            d = ys["npos"][t] - p
            to_goal = gpn - p
            aligned = float(np.dot(d, to_goal) /
                            (np.linalg.norm(d) * np.linalg.norm(to_goal) + 1e-12))
            medpx = float(np.median(err_px[val])) if val.any() else -1.0
            print(f"t{k:4d} err {perr*100:6.2f}cm nval {int(ys['num_valid'][t]):2d} "
                  f"inlier {inl:.2f} sim {ys['mean_sim'][t]:.3f} "
                  f"|v| {np.linalg.norm(ys['v_c'][t]):.4f} align {aligned:+.2f} "
                  f"medpx {medpx:6.1f}", flush=True)
    print(f"final err {float(np.linalg.norm(np.asarray(carry[0]) - gpn))*100:.2f} cm")


if __name__ == "__main__":
    main()
