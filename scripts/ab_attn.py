"""Interleaved A/B: XLA vs Pallas-flash attention in the int8 serving step.

Same chained-servo slope methodology as bench.py (two chain lengths cancel
the ~30 ms tunnel RTT), but both variants compile up front and their timed
reps interleave in ONE process, so chip/tunnel drift between runs cannot
confound the comparison (r2 lesson: separate-process measurements of the
same graph drifted 2.5 -> 3.0 ms).

Usage: python -u scripts/ab_attn.py [--size 518] [--model dinov2_vitb14]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FRAMES = 4
CHAIN_SHORT = 5
CHAIN_LONG = 45
REPS = 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--model", default="dinov2_vitb14")
    ap.add_argument("--variants", default="xla,fast",
                    help="comma list of attn_impl values to A/B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors, servo_step
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.models import vit as vit_mod
    from vitvs_tpu.models.quant import quantize_vit_params

    cfg = VSConfig(dino_input_size=args.size, model_name=args.model,
                   layer=11, pinv_mode="dls")
    base = ServoModel.create(cfg, compute_dtype=jnp.bfloat16)
    base = dataclasses.replace(base, quantized=True)
    params = quantize_vit_params(vit_mod.init_vit(base.vit, jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.random((N_FRAMES, cfg.v_max, cfg.u_max, 3)), jnp.float32))
    depth = jax.device_put(jnp.full((cfg.v_max, cfg.u_max), 0.61, jnp.float32))

    variants = {}
    cal_params = None
    for spec in args.variants.split(","):
        # spec grammar: ATTN[+cal][+ppPREC], e.g. "nomax", "nomax+ppdefault",
        # "nomax+cal+ppdefault" — ppPREC sets ServoModel.pp_precision; 'cal'
        # swaps in statically-calibrated activation scales (SmoothQuant fold,
        # models/quant.py) calibrated on the staged frames.  Suffix order is
        # free: each "+tok" is parsed independently (an earlier partition()
        # chain silently DROPPED suffixes after +cal/+nofuse).
        impl, *mods = spec.split("+")
        pp = pe = ""
        score = ""
        kvp = 0
        kvimpl = ""
        kvwhere = ""
        unroll = 0
        nofuse = cal = lnbf16 = False
        for tok in mods:
            if tok.startswith("pp"):
                pp = tok[2:]
            elif tok == "nofuse":
                nofuse = True
            elif tok == "cal":
                cal = True
            elif tok.startswith("pe"):
                pe = tok[2:]   # patch_embed_impl override
            elif tok in ("relu", "sqrelu"):
                score = tok    # attn_score redesign
            elif tok.startswith("pool"):
                kvp = int(tok[4:])   # kv_pool redesign
            elif tok == "mm":
                kvimpl = "matmul"    # kv_pool via static pooling matmul
            elif tok == "pre":
                kvwhere = "pre"      # pool-then-project (kv_pool_where)
            elif tok == "lnbf16":
                lnbf16 = True        # LayerNorm stats in compute dtype
            elif tok.startswith("unroll"):
                unroll = int(tok[6:])   # lax.scan unroll over blocks
            else:
                raise SystemExit(f"unknown variant modifier '+{tok}' in {spec!r}")
        if kvwhere and not kvp:
            raise SystemExit(
                f"'+pre' requires a '+poolN' modifier in {spec!r} "
                "(kv_pool_where is inert at kv_pool=1)")
        if kvimpl and not kvp:
            # '+mm' without '+poolN' would be a silent no-op vs base — an A/B
            # spec typo that reads back as a misleading "no difference"
            raise SystemExit(
                f"'+mm' requires a '+poolN' modifier in {spec!r} "
                "(kv_pool_impl is inert at kv_pool=1)")
        if impl in ("pv", "qk+pv", "fused", "nomax", "nomax2", "nomax3"):
            # int8 attention modes (models/quant.py) rather than attn_impl
            vit = dataclasses.replace(base.vit, quant_attn=impl)
        else:
            vit = dataclasses.replace(base.vit, attn_impl=impl)
        if pe:
            vit = dataclasses.replace(vit, patch_embed_impl=pe)
        if score:
            vit = dataclasses.replace(vit, attn_score=score)
        if kvp:
            vit = dataclasses.replace(vit, kv_pool=kvp)
        if kvimpl:
            vit = dataclasses.replace(vit, kv_pool_impl=kvimpl)
        if kvwhere:
            vit = dataclasses.replace(vit, kv_pool_where=kvwhere)
        if lnbf16:
            vit = dataclasses.replace(vit, ln_f32=False)
        if unroll:
            vit = dataclasses.replace(vit, scan_unroll=unroll)
        model = dataclasses.replace(base, vit=vit)
        if pp:
            model = dataclasses.replace(model, pp_precision=pp)
        if nofuse:
            model = dataclasses.replace(model, fused_bin_quant=False)
        if cal and cal_params is None:
            from vitvs_tpu.harness.pipeline import preprocess

            calib = jax.vmap(lambda f: preprocess(base, f))(frames)
            cal_params = quantize_vit_params(
                vit_mod.init_vit(base.vit, jax.random.PRNGKey(0)),
                cfg=base.vit, calib_images=calib, layer=11)
        variants[spec] = (model, cal_params if cal else None)

    def make_chain(model, n):
        @jax.jit
        def run(params, goal, frames, depth, key):
            def body(carry, inp):
                ema_v, ema_i, prev = carry
                i, k = inp
                frame = jax.lax.dynamic_index_in_dim(frames, i % N_FRAMES, 0,
                                                     keepdims=False)
                res = servo_step(params, model, goal, frame, depth,
                                 EmaState(ema_v, ema_i), prev, k)
                return (res.ema.value, res.ema.initialized, res.v_c), res.v_c

            keys = jax.random.split(key, n)
            _, vs = jax.lax.scan(
                body, (jnp.zeros(6), jnp.zeros((), bool), jnp.zeros(6)),
                (jnp.arange(n), keys))
            return vs

        return run

    chains = {}
    for name, (model, p_override) in variants.items():
        p = params if p_override is None else p_override
        # goal recomputed per variant: its pytree TYPE depends on the model
        # (QuantizedBinned on the source-quantized path, raw (t, d) otherwise)
        g = jax.jit(lambda pp, f, m=model: goal_descriptors(pp, m, f))(
            p, frames[0])
        jax.block_until_ready(g)
        for n in (CHAIN_SHORT, CHAIN_LONG):
            t0 = time.time()
            fn = make_chain(model, n)
            out = np.asarray(fn(p, g, frames, depth, jax.random.PRNGKey(0)))
            chains[(name, n)] = (fn, p, g)
            print(f"[compile] {name} n={n}: {time.time()-t0:.0f}s "
                  f"v_c[-1]={out[-1][:3]}", flush=True)

    best = {k: float("inf") for k in chains}
    for r in range(REPS):
        for key_ in chains:
            fn, p, g = chains[key_]
            t0 = time.perf_counter()
            np.asarray(fn(p, g, frames, depth, jax.random.PRNGKey(r + 1)))
            best[key_] = min(best[key_], time.perf_counter() - t0)
        print(f"[rep {r}] " + "  ".join(
            f"{k[0]}/{k[1]}={best[k]*1e3:.1f}ms" for k in sorted(chains)),
            flush=True)

    for name in variants:
        per = (best[(name, CHAIN_LONG)] - best[(name, CHAIN_SHORT)]) / (
            CHAIN_LONG - CHAIN_SHORT)
        print(f"RESULT {name}: {per*1e3:.3f} ms/iter = {1.0/per:.1f} Hz",
              flush=True)


if __name__ == "__main__":
    main()
