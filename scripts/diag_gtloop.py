"""Closed-loop servo with PERFECT ground-truth correspondences.

Replaces the feature pipeline with the analytic plane-induced correspondence
(24 fixed goal-image points projected into the current view), keeping the
identical control law, EMA, clipping, and integrator.  If this loop fails,
the control/dynamics layer is the blocker; if it converges, the feature
pipeline's degradation during the transient is.

Usage: python -u scripts/diag_gtloop.py [--episodes 0:8] [--steps 600] [--spin 90]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", default="0:8")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--spin", type=float, default=None,
                    help="instead of sampled episodes, pure optical-axis spin"
                         " of this many degrees at the goal position")
    ap.add_argument("--num-pairs", type=int, default=24)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vitvs_tpu.control import (EmaState, body_twist_from_optical,
                                   depth_at_points, ema_update, ibvs_velocity)
    from vitvs_tpu.core import se3
    from vitvs_tpu.harness import samplers
    from vitvs_tpu.harness.pipeline import ServoModel
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import env_step, load_poster_scene, render

    cfg = VSConfig()
    model = ServoModel.create(cfg, compute_dtype=jnp.float32)
    scene = load_poster_scene()
    cam = model.camera

    gp = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    gq = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)

    # fixed goal points: a 6x4 grid well inside the image
    us = np.linspace(80, 560, 6)
    vs = np.linspace(60, 420, 4)
    uv_star = np.array([[u, v] for v in vs for u in us], np.float32)

    def gt_current(uv_goal, p, q):
        from vitvs_tpu.core.camera import reproject_via_plane

        uv_b, _, _, z_b = reproject_via_plane(cam, uv_goal, gp, gq,
                                              p, q, scene.plane_z)
        return uv_b, z_b

    @jax.jit
    def run(pos0, quat0):
        def body(c, _):
            pos, quat, ema_v, ema_i, prev_v = c
            uv, z_true = gt_current(uv_star, pos, quat)
            # points visible and in front
            vis = ((uv[:, 0] >= 0) & (uv[:, 0] < cfg.u_max)
                   & (uv[:, 1] >= 0) & (uv[:, 1] < cfg.v_max) & (z_true > 0))
            _, depth = render(scene, cam, pos, quat)
            s_xy = cam.pixel_to_normalized(jnp.round(uv))
            s_star_xy = cam.pixel_to_normalized(jnp.asarray(uv_star))
            Z = depth_at_points(depth, jnp.round(uv))
            v_raw = ibvs_velocity(s_xy, s_star_xy, Z, cfg.lambda_, valid=vis,
                                  mode="dls", damping=cfg.pinv_damping)
            ok = jnp.sum(vis) >= 4
            ema_new, v_sm = ema_update(EmaState(ema_v, ema_i), v_raw,
                                       cfg.ema_alpha)
            v_c = jnp.where(ok, v_sm, prev_v)
            body_tw = body_twist_from_optical(v_c, cfg.max_velocity)
            npos, nquat = env_step(pos, quat, body_tw, cfg.control_dt)
            return ((npos, nquat,
                     jnp.where(ok, ema_new.value, ema_v),
                     jnp.where(ok, ema_new.initialized, ema_i), v_c),
                    (jnp.linalg.norm(pos - gp), jnp.sum(vis)))

        c0 = (pos0, quat0, jnp.zeros(6), jnp.zeros((), bool), jnp.zeros(6))
        cN, (errs, nvis) = jax.lax.scan(body, c0, None, length=args.steps)
        return errs, nvis, cN[0], cN[1]

    if args.spin is not None:
        rot = se3.quat_from_axis_angle(jnp.array([1.0, 0, 0]),
                                       np.radians(args.spin))
        # spin about the camera optical axis = body x-axis
        quat0 = se3.quat_multiply(gq, rot)
        cases = [("spin%.0f" % args.spin, gp, quat0)]
    else:
        lo, hi = (int(x) for x in args.episodes.split(":"))
        positions, quats, _ = samplers.generate_episode_starts(cfg)
        cases = [(f"ep{i}", jnp.asarray(positions[i], jnp.float32),
                  jnp.asarray(quats[i], jnp.float32)) for i in range(lo, hi)]

    for name, p0, q0 in cases:
        errs, nvis, pf, qf = run(p0, q0)
        errs = np.asarray(errs)
        e0 = errs[0]
        qd = float(jnp.abs(jnp.dot(qf, gq)))
        ang = np.degrees(2 * np.arccos(min(qd, 1.0)))
        status = ("conv" if errs[-1] < 0.01 and ang < 1.0 else
                  "DIV" if errs[-1] > 5 * e0 else "wander")
        print(f"{name:8s} e0 {e0*100:6.1f}cm peak {errs.max()*100:7.1f}cm "
              f"final {errs[-1]*100:7.2f}cm rot {ang:6.2f}deg "
              f"minvis {int(np.asarray(nvis).min()):2d} {status}", flush=True)


if __name__ == "__main__":
    main()
