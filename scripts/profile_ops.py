"""Op-level TPU profile of the serving forward: capture a jax.profiler trace
of the chained servo/descriptor graph and print the top XLA ops by self time.

Usage: python scripts/profile_ops.py [step|desc] [--quant] [--attn xla]
Parses the raw xplane proto directly (the tensorboard profile plugin's
converters are broken in this image).
"""

import argparse
import glob
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(logdir):
    """xplane.pb -> list of (op_name, self_us, occurrences).

    Parses the raw XSpace proto directly (tensorflow's bundled xplane_pb2) —
    both tensorboard-plugin-profile converter entry points are broken in
    this image (protobuf codegen mismatch / missing pywrap symbol).
    Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python, which main()
    sets before the tensorflow import."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspaces = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xspaces, f"no xplane under {logdir}"
    tot = {}
    for path in xspaces:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    d = tot.setdefault(name, [0.0, 0])
                    d[0] += ev.duration_ps / 1e6
                    d[1] += 1
    return sorted(((k, v[0], v[1]) for k, v in tot.items()),
                  key=lambda x: -x[1])


def main():
    # pure-python protobuf: the generated _pb2 files predate this image's
    # protoc and reject the C++ fastpath
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["step", "desc"], nargs="?", default="desc")
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--cal", action="store_true",
                    help="static calibrated activation scales (bench config)")
    ap.add_argument("--attn", default="xla")
    ap.add_argument("--qattn", default=None,
                    help="int8 attention mode (models/quant.py quant_attn):"
                         " pv | qk+pv | fused | nomax")
    ap.add_argument("--pp", default=None,
                    help="preprocess resize precision (ServoModel.pp_precision)")
    ap.add_argument("--pe", default=None,
                    help="patch_embed_impl (reshape | conv | einsum6)")
    ap.add_argument("--pool", type=int, default=0,
                    help="kv_pool factor (0/1 = off)")
    ap.add_argument("--poolimpl", default="matmul",
                    help="kv_pool_impl (window | matmul)")
    ap.add_argument("--poolwhere", default="post",
                    help="kv_pool_where (post | pre)")
    ap.add_argument("--model", default="dinov2_vitb14")
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import (ServoModel, goal_descriptors,
                                            preprocess, servo_step)
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.models import vit as vit_mod
    from vitvs_tpu.models.extractor import extract_descriptors

    cfg = VSConfig(dino_input_size=args.size, model_name=args.model, layer=11,
                   pinv_mode="dls")
    model = ServoModel.create(cfg, compute_dtype=jnp.bfloat16)
    model = dc.replace(model, vit=dc.replace(model.vit, attn_impl=args.attn))
    if args.qattn:
        model = dc.replace(model, vit=dc.replace(model.vit, quant_attn=args.qattn))
    if args.pp:
        model = dc.replace(model, pp_precision=args.pp)
    if args.pe:
        model = dc.replace(model, vit=dc.replace(model.vit,
                                                 patch_embed_impl=args.pe))
    if args.pool and args.pool > 1:
        model = dc.replace(model, vit=dc.replace(
            model.vit, kv_pool=args.pool, kv_pool_impl=args.poolimpl,
            kv_pool_where=args.poolwhere))
    params = vit_mod.init_vit(model.vit, jax.random.PRNGKey(0))
    if args.quant:
        from vitvs_tpu.models.quant import quantize_vit_params

        model = dc.replace(model, quantized=True)
        if args.cal:
            _frames = jnp.asarray(
                np.random.default_rng(0).random((4, 480, 640, 3), np.float32))
            calib = jax.jit(jax.vmap(lambda f: preprocess(model, f)))(_frames)
            params = quantize_vit_params(params, cfg=model.vit,
                                         calib_images=calib, layer=cfg.layer)
        else:
            params = quantize_vit_params(params)

    rng = np.random.default_rng(0)
    N = 4
    frames = jax.device_put(jnp.asarray(rng.random((N, 480, 640, 3), np.float32)))
    depth = jax.device_put(jnp.full((480, 640), 0.61, jnp.float32))
    goal = jax.jit(lambda p, f: goal_descriptors(p, model, f))(params, frames[0])
    jax.block_until_ready(goal)
    n = args.chain

    if args.what == "desc":
        @jax.jit
        def run(params, frames, key):
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

        call = lambda key: run(params, frames, key)
    else:
        @jax.jit
        def run(params, goal, frames, depth, key):
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

        call = lambda key: run(params, goal, frames, depth, key)

    t0 = time.time()
    np.asarray(call(jax.random.PRNGKey(0)))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    logdir = args.logdir or tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(logdir):
        np.asarray(call(jax.random.PRNGKey(1)))
    print(f"trace in {logdir}", flush=True)

    rows = parse_xplane(logdir)
    total = sum(r[1] for r in rows)
    print(f"\n{'self us':>10} {'%':>6} {'count':>6}  op")
    for name, us, cnt in rows[: args.top]:
        print(f"{us:10.0f} {100*us/total:6.2f} {cnt:6d}  {name[:110]}")
    print(f"\nsum of event durations: {total/1000:.2f} ms over {n} iterations "
          f"=> {total/1000/n:.3f} ms/iter (upper bound; lanes may overlap)")


if __name__ == "__main__":
    main()
