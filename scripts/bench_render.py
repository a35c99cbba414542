"""Measure texture-sampling strategies for the sim renderer on TPU.

The closed-loop benchmark's wall time is dominated NOT by the ViT but by
the renderer's bilinear texture lookup: 4 random-index gathers over 307k
pixels per frame (r2 finding: ~4 min per 16-episode x 250-step segment vs
~1 s of ViT FLOPs).  TPU gathers are the architecture's weakest op, so
the sampling strategy matters more than anything else in the sim layer.

Variants:
  2d      — tex[r0, c0] 2-D advanced indexing (current implementation)
  flat    — tex_flat[r0 * W + c0] 1-D take, same numerics bit-for-bit
  block   — ONE 1-D take from a precomputed (H*W, 12) 2x2-neighborhood
            texture (4x fewer gather rows, channels hold the quad), same
            numerics
  nearest — single 1-D take, nearest-neighbor (numerics change; lower bound)

Methodology: slope timing between two scan-chain lengths (cancels tunnel
RTT), batch of 16 poses like the benchmark chunks.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--short", type=int, default=4)
    ap.add_argument("--long", type=int, default=24)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (numerics check / smoke only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vitvs_tpu.core.camera import CameraIntrinsics
    from vitvs_tpu.core import se3
    from vitvs_tpu.harness.benchmark import build_scene
    from vitvs_tpu.harness.samplers import generate_episode_starts
    from vitvs_tpu.io_bridge.config import VSConfig

    cfg = VSConfig()
    cam = CameraIntrinsics(width=cfg.u_max, height=cfg.v_max,
                           fx=cfg.f_x, fy=cfg.f_y)
    scene = build_scene()
    tex = scene.texture
    ht, wt, _ = tex.shape
    tex_flat = tex.reshape(ht * wt, 3)
    # 2x2 neighborhood texture: channel-packed quad at each texel
    tshift = jnp.pad(tex, ((0, 1), (0, 1), (0, 0)), mode="edge")
    tex4 = jnp.concatenate([
        tshift[:-1, :-1], tshift[:-1, 1:], tshift[1:, :-1], tshift[1:, 1:],
    ], axis=-1).reshape(ht * wt, 12)

    positions, quats, _ = generate_episode_starts(cfg)
    poss = jnp.asarray(positions[: args.batch], jnp.float32)
    qs = jnp.asarray(quats[: args.batch], jnp.float32)

    def ray_coords(pos, quat):
        d_c = cam.ray_directions()
        r_wc = se3.matrix_from_quat(quat) @ se3.R_BODY_FROM_OPTICAL
        d_w = jnp.einsum("ij,hwj->hwi", r_wc, d_c)
        t = (scene.plane_z - pos[2]) / jnp.where(
            jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])
        pt = pos + t[..., None] * d_w
        hs_x, hs_y = scene.half_size[0], scene.half_size[1]
        cols = (hs_y - pt[..., 1]) / (2 * hs_y) * (wt - 1)
        rows = (hs_x - pt[..., 0]) / (2 * hs_x) * (ht - 1)
        return rows, cols

    def idx_frac(rows, cols):
        r0 = jnp.clip(jnp.floor(rows).astype(jnp.int32), 0, ht - 1)
        c0 = jnp.clip(jnp.floor(cols).astype(jnp.int32), 0, wt - 1)
        fr = (rows - jnp.floor(rows))[..., None].astype(jnp.float32)
        fc = (cols - jnp.floor(cols))[..., None].astype(jnp.float32)
        r1 = jnp.minimum(r0 + 1, ht - 1)
        c1 = jnp.minimum(c0 + 1, wt - 1)
        return r0, c0, r1, c1, fr, fc

    def sample_2d(rows, cols):
        r0, c0, r1, c1, fr, fc = idx_frac(rows, cols)
        v00, v01 = tex[r0, c0], tex[r0, c1]
        v10, v11 = tex[r1, c0], tex[r1, c1]
        top = v00 * (1 - fc) + v01 * fc
        bot = v10 * (1 - fc) + v11 * fc
        return top * (1 - fr) + bot * fr

    def sample_flat(rows, cols):
        r0, c0, r1, c1, fr, fc = idx_frac(rows, cols)
        take = lambda r, c: jnp.take(tex_flat, r * wt + c, axis=0)
        top = take(r0, c0) * (1 - fc) + take(r0, c1) * fc
        bot = take(r1, c0) * (1 - fc) + take(r1, c1) * fc
        return top * (1 - fr) + bot * fr

    def sample_block(rows, cols):
        r0, c0, _, _, fr, fc = idx_frac(rows, cols)
        quad = jnp.take(tex4, r0 * wt + c0, axis=0)   # (..., 12)
        v00, v01, v10, v11 = (quad[..., 0:3], quad[..., 3:6],
                              quad[..., 6:9], quad[..., 9:12])
        top = v00 * (1 - fc) + v01 * fc
        bot = v10 * (1 - fc) + v11 * fc
        return top * (1 - fr) + bot * fr

    def sample_nearest(rows, cols):
        r = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, ht - 1)
        c = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, wt - 1)
        return jnp.take(tex_flat, r * wt + c, axis=0)

    variants = {"2d": sample_2d, "flat": sample_flat, "block": sample_block,
                "nearest": sample_nearest}

    def make_chain(fn, n):
        @jax.jit
        def run(poss, qs, key):
            def body(carry, k):
                # jitter poses so the render can't be hoisted
                dp = jax.random.normal(k, poss.shape) * 1e-3

                def one(pos, quat):
                    rows, cols = ray_coords(pos, quat)
                    return fn(rows, cols)

                rgb = jax.vmap(one)(poss + dp, qs)
                return carry + jnp.mean(rgb), None

            keys = jax.random.split(key, n)
            acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
            return acc

        return run

    # numerics check (flat/block must equal 2d bitwise)
    rows, cols = ray_coords(poss[0], qs[0])
    ref = np.asarray(sample_2d(rows, cols))
    for name in ("flat", "block"):
        got = np.asarray(variants[name](rows, cols))
        print(f"[check] {name}: max |diff| = {np.abs(got - ref).max():.2e}",
              flush=True)

    for name, fn in variants.items():
        chains = {}
        for n in (args.short, args.long):
            t0 = time.time()
            c = make_chain(fn, n)
            float(c(poss, qs, jax.random.PRNGKey(0)))
            chains[n] = c
            print(f"[compile] {name} n={n}: {time.time()-t0:.0f}s", flush=True)
        best = {n: float("inf") for n in chains}
        for r in range(args.reps):
            for n, c in chains.items():
                t0 = time.perf_counter()
                float(c(poss, qs, jax.random.PRNGKey(r + 1)))
                best[n] = min(best[n], time.perf_counter() - t0)
        per = (best[args.long] - best[args.short]) / (args.long - args.short)
        print(f"RESULT {name}: {per*1e3:.2f} ms per batch-{args.batch} "
              f"render step", flush=True)


if __name__ == "__main__":
    main()
