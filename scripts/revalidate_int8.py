"""Revalidate int8 serving fidelity on TRAINED descriptors (VERDICT r1 #8).

Round-1 validated int8-vs-bf16 argmax-exactness only on random-weight
descriptor distributions; trained descriptors concentrate differently and
can quantize worse.  This script loads the in-sim-trained checkpoint,
renders real benchmark start views (seed-41 episode distribution), and
compares the SELECTED correspondences and resulting IBVS velocities across
serving paths:

  bf16       — full-precision reference path
  int8-dyn   — W8A8, per-token dynamic activation scales
  int8-static— W8A8, calibrated static scales + SmoothQuant folding

Writes artifacts/int8_reval.json with per-view match agreement and velocity
deltas.

Usage: python -u scripts/revalidate_int8.py --checkpoint artifacts/ckpt_vits308
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="artifacts/ckpt_vits308")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--out", default="artifacts/int8_reval.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.benchmark import build_scene
    from vitvs_tpu.harness.pipeline import (ServoModel, goal_descriptors,
                                            servo_step)
    from vitvs_tpu.harness.samplers import generate_episode_starts
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.models.convert import load_params
    from vitvs_tpu.models.quant import quantize_vit_params
    from vitvs_tpu.sim.env import observe

    cfg = VSConfig()
    model_fp = ServoModel.create(cfg, compute_dtype=jnp.bfloat16)
    model_q = dataclasses.replace(model_fp, quantized=True)
    params = load_params(args.checkpoint)
    scene = build_scene()

    positions, quats = generate_episode_starts(cfg)[:2]
    positions, quats = positions[: args.views], quats[: args.views]

    from vitvs_tpu.harness.samplers import (DESIRED_ORIENTATION,
                                            DESIRED_POSITION)

    goal_pos = jnp.asarray(DESIRED_POSITION, jnp.float32)
    goal_quat = jnp.asarray(DESIRED_ORIENTATION, jnp.float32)

    @jax.jit
    def render_view(scene, pos, quat):
        return observe(scene, model_fp.camera, pos, quat)

    goal_rgb, _ = render_view(scene, goal_pos, goal_quat)

    # calibrate static scales on the goal view + 3 start views
    calib = jnp.stack(
        [jax.image.resize(goal_rgb, (cfg.dino_input_size,) * 2 + (3,),
                          "linear")]
        + [jax.image.resize(
            render_view(scene, jnp.asarray(positions[i], jnp.float32),
                        jnp.asarray(quats[i], jnp.float32))[0],
            (cfg.dino_input_size,) * 2 + (3,), "linear")
           for i in range(min(3, args.views))])

    paths = {
        "bf16": (model_fp, params),
        "int8_dyn": (model_q, quantize_vit_params(params)),
        "int8_static": (model_q, quantize_vit_params(
            params, model_q.vit, calib_images=calib, layer=cfg.layer)),
    }

    steps = {}
    for name, (m, p) in paths.items():
        goal = jax.jit(lambda p_, f, m_=m: goal_descriptors(p_, m_, f))(p, goal_rgb)

        @jax.jit
        def step(p_, goal_, rgb, depth, key, m_=m):
            return servo_step(p_, m_, goal_, rgb, depth,
                              EmaState(jnp.zeros(6), jnp.zeros((), bool)),
                              jnp.zeros(6), key)

        steps[name] = (step, p, goal)

    report = {"views": [], "checkpoint": args.checkpoint}
    agree_dyn = agree_static = 0.0
    vdel_dyn = vdel_static = 0.0
    for i in range(args.views):
        rgb, depth = render_view(scene, jnp.asarray(positions[i], jnp.float32),
                                 jnp.asarray(quats[i], jnp.float32))
        key = jax.random.PRNGKey(1000 + i)
        res = {}
        for name, (step, p, goal) in steps.items():
            r = step(p, goal, rgb, depth, key)
            res[name] = dict(
                uv=np.asarray(r.s_uv), uv_star=np.asarray(r.s_uv_star),
                valid=np.asarray(r.valid), v=np.asarray(r.v_c),
                nval=int(r.num_valid), sim=float(r.mean_sim))

        def match_agreement(a, b):
            pa = {(tuple(u), tuple(g)) for u, g, v in
                  zip(a["uv"], a["uv_star"], a["valid"]) if v}
            pb = {(tuple(u), tuple(g)) for u, g, v in
                  zip(b["uv"], b["uv_star"], b["valid"]) if v}
            return len(pa & pb) / max(len(pa | pb), 1)

        bf = res["bf16"]
        vn = max(float(np.linalg.norm(bf["v"])), 1e-9)
        row = {
            "view": i,
            "bf16_valid": bf["nval"],
            "dyn_match_iou": match_agreement(bf, res["int8_dyn"]),
            "static_match_iou": match_agreement(bf, res["int8_static"]),
            "dyn_vel_rel": float(
                np.linalg.norm(res["int8_dyn"]["v"] - bf["v"]) / vn),
            "static_vel_rel": float(
                np.linalg.norm(res["int8_static"]["v"] - bf["v"]) / vn),
            "mean_sim": bf["sim"],
        }
        report["views"].append(row)
        agree_dyn += row["dyn_match_iou"]; agree_static += row["static_match_iou"]
        vdel_dyn += row["dyn_vel_rel"]; vdel_static += row["static_vel_rel"]
        print(f"[view {i}] valid={bf['nval']} iou dyn={row['dyn_match_iou']:.3f} "
              f"static={row['static_match_iou']:.3f} vel_rel dyn="
              f"{row['dyn_vel_rel']:.4f} static={row['static_vel_rel']:.4f}",
              flush=True)

    n = args.views
    report["summary"] = {
        "mean_match_iou_dyn": agree_dyn / n,
        "mean_match_iou_static": agree_static / n,
        "mean_vel_rel_dyn": vdel_dyn / n,
        "mean_vel_rel_static": vdel_static / n,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print("[summary]", json.dumps(report["summary"]), flush=True)


if __name__ == "__main__":
    main()
