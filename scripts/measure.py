"""On-TPU microbenchmark harness for pipeline components.

Usage: python scripts/measure.py [desc|step|match|attn|pre] [--quant] ...
Prints per-iteration device time via the SLOPE between a long and a short
chained scan (same methodology as bench.py) — subtracting a measured "RTT
floor" from a single chain underestimates the tunnel's per-call overhead
and was seen to inflate results by up to 50%.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["desc", "step", "match", "attn", "pre"])
    ap.add_argument("--bf16-params", action="store_true")
    ap.add_argument("--chain", type=int, default=45)
    ap.add_argument("--chain-short", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--model", default="dinov2_vitb14")
    ap.add_argument("--no-bin", action="store_true")
    ap.add_argument("--attn", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--gelu-approx", action="store_true")
    ap.add_argument("--fast-math", action="store_true",
                    help="gelu approx + bf16 LN + bf16 softmax")
    ap.add_argument("--softmax-bf16", action="store_true", help="bf16 softmax only")
    ap.add_argument("--quant", action="store_true", help="int8 W8A8 ViT path")
    ap.add_argument("--static-scales", action="store_true",
                    help="calibrated static qkv/fc1 activation scales")
    ap.add_argument("--size", type=int, default=518)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors, preprocess, servo_step
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.match import find_correspondences
    from vitvs_tpu.models import vit as vit_mod
    from vitvs_tpu.models.extractor import extract_descriptors

    cfg = VSConfig(dino_input_size=args.size, model_name=args.model, layer=11,
                   pinv_mode="dls",
                   use_feature_binning=not args.no_bin)
    model = ServoModel.create(cfg, compute_dtype=jnp.bfloat16)
    import dataclasses as _dc
    vit_kw = {"scan_unroll": args.unroll, "gelu_approx": args.gelu_approx}
    if args.fast_math:
        vit_kw.update(gelu_approx=True, ln_f32=False, softmax_f32=False)
    if args.softmax_bf16:
        vit_kw.update(softmax_f32=False)
    if args.attn != "auto":
        vit_kw["attn_impl"] = args.attn
    model = _dc.replace(model, vit=_dc.replace(model.vit, **vit_kw))
    params = vit_mod.init_vit(model.vit, jax.random.PRNGKey(0))
    if args.bf16_params:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    N = 4
    if args.quant:
        from vitvs_tpu.models.quant import quantize_vit_params
        import dataclasses as _dc2
        calib = None
        if args.static_scales:
            calib = jnp.asarray(rng.random((2, args.size, args.size, 3)),
                                jnp.float32)
        params = quantize_vit_params(params, cfg=model.vit, calib_images=calib,
                                     layer=cfg.layer)
        model = _dc2.replace(model, quantized=True)
    frames = jax.device_put(jnp.asarray(rng.random((N, 480, 640, 3), np.float32)))
    depth = jax.device_put(jnp.full((480, 640), 0.61, jnp.float32))
    goal = jax.jit(lambda p, f: goal_descriptors(p, model, f))(params, frames[0])
    jax.block_until_ready(goal)
    print(f"[measure] goal desc shape {goal.shape}", flush=True)

    grid = model.grid()

    # NOTE: params/frames/etc must be jit ARGUMENTS, not closure captures —
    # captured arrays are embedded as constants in the (remote) compile
    # payload, which rejects large requests.
    def build(n):
        if args.what == "pre":
            @jax.jit
            def run_(frames, key):
                def body(c, inp):
                    i, k = inp
                    fr = jax.lax.dynamic_index_in_dim(frames, i % N, 0, keepdims=False)
                    x = preprocess(model, fr)
                    return c + x.sum(), None
                out, _ = jax.lax.scan(body, 0.0, (jnp.arange(n), jax.random.split(key, n)))
                return out
            return lambda key: run_(frames, key)
        elif args.what == "desc":
            @jax.jit
            def run_(params, frames, key):
                def body(c, inp):
                    i, k = inp
                    fr = jax.lax.dynamic_index_in_dim(frames, i % N, 0, keepdims=False)
                    x = preprocess(model, fr)[None]
                    d = extract_descriptors(params, model.vit, x, layer=cfg.layer,
                                            facet="token", bin=cfg.use_feature_binning,
                                            compute_dtype=jnp.bfloat16,
                                            quantized=model.quantized)[0, 0]
                    return c + d.astype(jnp.float32).sum(), None
                out, _ = jax.lax.scan(body, 0.0, (jnp.arange(n), jax.random.split(key, n)))
                return out
            return lambda key: run_(params, frames, key)
        elif args.what == "match":
            descs = jax.device_put(jnp.asarray(
                rng.standard_normal((N, goal.shape[0], goal.shape[1])), goal.dtype))

            @jax.jit
            def run_(goal, descs, key):
                def body(c, inp):
                    i, k = inp
                    d = jax.lax.dynamic_index_in_dim(descs, i % N, 0, keepdims=False)
                    m = find_correspondences(goal, d, grid, cfg.num_pairs, k,
                                             use_kernel=model.use_match_kernel,
                                             int8=model.quantized)
                    return c + m.points1.sum() + m.sim.sum(), None
                out, _ = jax.lax.scan(body, 0.0, (jnp.arange(n), jax.random.split(key, n)))
                return out
            return lambda key: run_(goal, descs, key)
        elif args.what == "attn":
            t = grid[0] * grid[1] + 1
            h, hd = model.vit.num_heads, model.vit.head_dim
            qs = jax.device_put(jnp.asarray(
                rng.standard_normal((N, 1, t, h, hd)), jnp.bfloat16))

            @jax.jit
            def run_(qs, key):
                from vitvs_tpu.ops.attention import mha_attention

                def body(c, inp):
                    i, k = inp
                    q = jax.lax.dynamic_index_in_dim(qs, i % N, 0, keepdims=False)
                    o = mha_attention(q, q, q)
                    return c + o.astype(jnp.float32).sum(), None
                out, _ = jax.lax.scan(body, 0.0, (jnp.arange(n), jax.random.split(key, n)))
                return out
            return lambda key: run_(qs, key)
        else:  # step
            @jax.jit
            def run_(params, goal, frames, depth, key):
                def body(carry, inp):
                    ev, ei, pv = carry
                    i, k = inp
                    fr = jax.lax.dynamic_index_in_dim(frames, i % N, 0, keepdims=False)
                    res = servo_step(params, model, goal, fr, depth,
                                     EmaState(ev, ei), pv, k)
                    return (res.ema.value, res.ema.initialized, res.v_c), None
                c, _ = jax.lax.scan(body, (jnp.zeros(6), jnp.zeros((), bool), jnp.zeros(6)),
                                    (jnp.arange(n), jax.random.split(key, n)))
                return c[2]
            return lambda key: run_(params, goal, frames, depth, key)

    n_long, n_short = args.chain, args.chain_short
    times = {}
    for n in (n_short, n_long):
        run = build(n)
        t0 = time.time()
        np.asarray(run(jax.random.PRNGKey(0)))
        print(f"[measure] chain {n}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(run(jax.random.PRNGKey(r + 1)))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[n_long] - times[n_short]) / (n_long - n_short) * 1000
    print(f"[measure] {args.what} ({args.model}@{args.size}, "
          f"{'bf16' if args.bf16_params else 'f32'} params, attn={args.attn}, "
          f"quant={args.quant}, bin={not args.no_bin}, unroll={args.unroll}): "
          f"{per:.3f} ms/iter  ({1000/per:.1f} Hz)", flush=True)


if __name__ == "__main__":
    main()
