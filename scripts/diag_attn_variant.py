"""Fidelity of the attention redesigns vs the trained softmax serving path.

The relu/sqrelu score and kv_pool redesigns (models/vit.py:_score_attention,
_pool_kv; docs/CAMPAIGN_ATTN_REDESIGN.md) change model semantics, so unlike
the int8 ladder they are NOT expected to be zero-shot faithful on a
softmax-trained checkpoint — this script measures exactly how unfaithful,
with the same match-IoU / velocity-delta methodology as revalidate_int8.py:

  * run with a softmax-trained checkpoint to size the zero-shot gap (how much
    co-training has to recover);
  * run with a co-trained checkpoint (--base relu etc.) to verify the variant
    path reproduces ITS OWN training-time semantics through the full
    servo_step (then the 64/500-episode sweeps are the converging evidence).

CPU-runnable: everything is the bf16 XLA path, no TPU-only kernels.

Usage:
  python -u scripts/diag_attn_variant.py --checkpoint artifacts/ckpt_real518 \
      [--size 518] [--views 4] [--base softmax] \
      [--variants relu,sqrelu,pool2,relu+pool2] [--out artifacts/attn_variant_fid.json]
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_variant(spec: str):
    """'relu+pool2' -> dict(attn_score='relu', kv_pool=2)."""
    out = {}
    for tok in spec.split("+"):
        if tok in ("relu", "sqrelu", "softmax"):
            out["attn_score"] = tok
        elif tok.startswith("pool"):
            out["kv_pool"] = int(tok[4:])
        else:
            raise SystemExit(f"unknown variant token {tok!r} in {spec!r}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="artifacts/ckpt_real518")
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--model", default="dinov2_vits14")
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--base", default="softmax",
                    help="variant spec the checkpoint was trained for")
    ap.add_argument("--variants", default="relu,sqrelu,pool2,relu+pool2")
    ap.add_argument("--out", default="artifacts/attn_variant_fid.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.benchmark import build_scene
    from vitvs_tpu.harness.pipeline import (ServoModel, goal_descriptors,
                                            servo_step)
    from vitvs_tpu.harness.samplers import (DESIRED_ORIENTATION,
                                            DESIRED_POSITION,
                                            generate_episode_starts)
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.models.convert import load_params
    from vitvs_tpu.sim.env import observe

    def make_model(spec):
        kw = parse_variant(spec)
        cfg = VSConfig(dino_input_size=args.size, model_name=args.model,
                       layer=11, pinv_mode="dls", **kw)
        return ServoModel.create(cfg, compute_dtype=jnp.bfloat16)

    base_model = make_model(args.base)
    params = load_params(args.checkpoint)
    scene = build_scene()

    positions, quats = generate_episode_starts(
        VSConfig(dino_input_size=args.size, model_name=args.model))[:2]
    positions, quats = positions[: args.views], quats[: args.views]

    @jax.jit
    def render_view(scene, pos, quat):
        return observe(scene, base_model.camera, pos, quat)

    goal_rgb, _ = render_view(scene,
                              jnp.asarray(DESIRED_POSITION, jnp.float32),
                              jnp.asarray(DESIRED_ORIENTATION, jnp.float32))

    specs = [args.base] + [s for s in args.variants.split(",") if s]
    steps = {}
    for spec in specs:
        m = base_model if spec == args.base else make_model(spec)
        goal = jax.jit(lambda p_, f, m_=m: goal_descriptors(p_, m_, f))(
            params, goal_rgb)

        @jax.jit
        def step(p_, goal_, rgb, depth, key, m_=m):
            return servo_step(p_, m_, goal_, rgb, depth,
                              EmaState(jnp.zeros(6), jnp.zeros((), bool)),
                              jnp.zeros(6), key)

        steps[spec] = (step, goal)

    def pairs(r, quant=1.0):
        """Valid (uv, uv*) pairs; quant>1 rounds coords to that grid, which
        is the honest comparison once subpixel parabola refinement is in the
        loop — float offsets never match exactly across semantic variants."""
        return {(tuple(np.round(u / quant).astype(int)),
                 tuple(np.round(g / quant).astype(int)))
                for u, g, v in zip(r["uv"], r["uv_star"], r["valid"]) if v}

    report = {"checkpoint": args.checkpoint, "base": args.base,
              "size": args.size, "views": []}
    sums = {s: dict(iou=0.0, patch_iou=0.0, vel=0.0, nval=0.0)
            for s in specs[1:]}
    for i in range(args.views):
        rgb, depth = render_view(scene,
                                 jnp.asarray(positions[i], jnp.float32),
                                 jnp.asarray(quats[i], jnp.float32))
        key = jax.random.PRNGKey(1000 + i)
        res = {}
        for spec, (step, goal) in steps.items():
            r = step(params, goal, rgb, depth, key)
            res[spec] = dict(uv=np.asarray(r.s_uv),
                             uv_star=np.asarray(r.s_uv_star),
                             valid=np.asarray(r.valid), v=np.asarray(r.v_c),
                             nval=int(r.num_valid), sim=float(r.mean_sim))
        bf = res[args.base]
        vn = max(float(np.linalg.norm(bf["v"])), 1e-9)
        pb = pairs(bf)
        pbp = pairs(bf, quant=14.0)  # patch-grid equivalence
        row = {"view": i, "base_valid": bf["nval"], "base_sim": bf["sim"]}
        for spec in specs[1:]:
            ra = res[spec]
            iou = len(pb & pairs(ra)) / max(len(pb | pairs(ra)), 1)
            pa = pairs(ra, quant=14.0)
            piou = len(pbp & pa) / max(len(pbp | pa), 1)
            vel = float(np.linalg.norm(ra["v"] - bf["v"]) / vn)
            row[spec] = dict(match_iou=round(iou, 4),
                             patch_iou=round(piou, 4),
                             vel_rel=round(vel, 4), valid=ra["nval"],
                             mean_sim=round(ra["sim"], 4))
            sums[spec]["iou"] += iou
            sums[spec]["patch_iou"] += piou
            sums[spec]["vel"] += vel
            sums[spec]["nval"] += ra["nval"]
        report["views"].append(row)
        print(f"[view {i}] base valid={bf['nval']} " + " ".join(
            f"{s}: piou={row[s]['patch_iou']:.3f} vel={row[s]['vel_rel']:.3f}"
            f" nval={row[s]['valid']}" for s in specs[1:]), flush=True)

    n = max(args.views, 1)
    report["mean"] = {s: {k: round(v / n, 4) for k, v in d.items()}
                      for s, d in sums.items()}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["mean"]))


if __name__ == "__main__":
    main()
