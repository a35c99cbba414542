"""Headline benchmark: closed-loop servo rate, ViT-B/14 @ 518^2, one chip.

Measures the full per-frame pipeline (preprocess 640x480 frame -> DINOv2-
style ViT-B/14 forward at 518^2 -> binned descriptors -> dense cosine match
-> IBVS velocity) as a SEQUENTIAL chain of servo iterations threaded through
the EMA state — true single-stream servo throughput, the reference's
per-iteration wall time (vitvs_v2.py:630-632).

Methodology notes:
* each chain step consumes a DIFFERENT camera frame (cycling a pre-staged
  stack), so XLA cannot hoist the ViT/matcher out of the scan as loop-
  invariant;
* the per-iteration time is the SLOPE between a long and a short chain,
  cancelling host<->device round-trip latency (this environment tunnels to
  the TPU with ~30 ms RTT, which would otherwise dominate);
* all inputs stay device-resident across timed calls.

North star (BASELINE.md): >= 500 Hz on one TPU v5e chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time


def _stage(msg):
    print(f"[bench-stage] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

import numpy as np

N_FRAMES = 4          # distinct staged camera frames, cycled
CHAIN_SHORT = 5
CHAIN_LONG = 45
REPS = 24  # best paired slope: the tunnel/chip adds run-to-run variance

# K/V pooling operating point (ViTConfig.kv_pool).  3 = the pool3+mm serving
# graph: 9x K/V compression via a static pooling-matrix einsum, -20% latency
# in the interleaved A/B (artifacts/logs/ab_poolmm.log), convergence-
# validated on the full 500-episode real-poster standard sweep (99.8%,
# identical to the un-pooled flagship — TASK_VALIDATION run AE) and
# perturbed-gated at 93.8% (within 2 pts of the flagship's 95.4%, run AG).
# 2 = the pool2mm point: -17%, 99.8% standard / 96.9% perturbed — the
# robustness-preferred alternative.  0 times the un-pooled nomax3 graph.
# r5: flipped to pool2mm (VERDICT item 5) — the reshape patch-embed fix
# (see vit_over below) put BOTH pooled points far clear of the 500 Hz
# gate, so the robustness-preferred pool2mm (96.9% perturbed, run AF,
# ABOVE the un-pooled flagship's 95.4%) becomes the flagship; the speed/
# robustness trade is gone.  r5 interleaved A/B (pereshape+pre): pool2
# 1.103 vs pool3 0.919 ms/iter.
KV_POOL = 2
# Where K/V pooling runs: 'pre' pools the normed tokens BEFORE the K/V
# projection (vit.ViTConfig.kv_pool_where — algebraically identical to
# project-then-pool, ~2.2x fewer qkv MACs; r5 interleaved A/B -7%);
# 'post' is the r4 layout.
KV_POOL_WHERE = "pre"

# Chip-window normalizer: a fixed bf16 matmul-chain graph timed with the
# same interleaved slope method.  The axon tunnel / shared chip drifts
# 10-20% between measurement windows (docs/ROOFLINE.md chip-state log:
# identical graphs read 1.99 vs 2.7 ms/iter across rounds), so every
# capture carries this constant-work reference time — drift between rounds
# is then quantified in the artifact itself rather than narrated in docs.
NORM_DIM = 2048
NORM_SHORT = 50
NORM_LONG = 450


def run_bench(model_name="dinov2_vitb14", kv_pool=None, input_size=518,
              metric=None, kv_pool_where=None):
    """Measure the serving graph for `model_name` @ `input_size` with the
    production int8 stack; returns the result dict (see main for the JSON
    contract).  `kv_pool=None` uses the flagship KV_POOL flip above."""
    import jax
    import jax.numpy as jnp

    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors, servo_step
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.models import vit as vit_mod

    import dataclasses

    from vitvs_tpu.models.quant import quantize_vit_params

    if kv_pool is None:
        kv_pool = KV_POOL
    if kv_pool_where is None:
        kv_pool_where = KV_POOL_WHERE
    cfg = VSConfig(dino_input_size=input_size, model_name=model_name,
                   layer=11, pinv_mode="dls")
    # production serving configuration: int8 W8A8 projections with STATIC
    # calibrated activation scales (SmoothQuant fold, models/quant.py),
    # 'nomax3' deferred-normalize attention (probs-sized VPU work is exactly
    # [min, exp2] in bf16: scale and log2(e) folded into Q, no row-max pass,
    # no shift, no dtype-cast passes), conv-lowered patch embed,
    # source-quantized binned descriptors (match/binned.py), bf16
    # single-pass preprocess resize (error below 8-bit sensor quantization),
    # tanh GELU, bf16 elsewhere.  This exact configuration is
    # convergence-validated end-to-end on the 500-episode real-poster sweep
    # — 98.6%, statistically identical to bf16's 98.4%
    # (docs/TASK_VALIDATION.md runs O/P/Q/R; run R is byte-for-byte this
    # graph) — and velocity-equivalence-tested through the full pipeline
    # (tests/test_quant.py).
    # Interleaved A/B ledger (scripts/ab_attn.py): nomax3 2.689 vs nomax2
    # 2.746 (slow-window capture; both ~27% faster in a clean window);
    # nomax2 1.992 vs nomax 2.044; peconv 2.073 vs 2.100; static scales
    # 2.085 vs 2.163 dynamic; fused bin-quant 2.165 vs 2.302.
    model = ServoModel.create(cfg, compute_dtype=jnp.bfloat16)
    # patch_embed_impl: 'reshape' — at the pooled operating points XLA's
    # conv lowering of the 3-channel patch embed degenerates (~0.62 ms of
    # conv + a 0.24 ms layout copy per iter, r5 op-profile); the explicit
    # patchify-reshape + matmul runs the same math in ~0.06 ms.  r5
    # interleaved A/B at pool3: reshape 1.443 vs conv 2.246 ms/iter.
    vit_over = dict(quant_attn="nomax3", patch_embed_impl="reshape")
    if kv_pool:
        vit_over.update(kv_pool=kv_pool, kv_pool_impl="matmul",
                        kv_pool_where=kv_pool_where)
    model = dataclasses.replace(
        model, quantized=True, pp_precision="default",
        vit=dataclasses.replace(model.vit, **vit_over))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((N_FRAMES, cfg.v_max, cfg.u_max, 3)),
                         jnp.float32)
    depth = jnp.full((cfg.v_max, cfg.u_max), 0.61, jnp.float32)
    frames = jax.device_put(frames)
    depth = jax.device_put(depth)

    from vitvs_tpu.harness.pipeline import preprocess

    _stage("calib compile")
    calib = jax.jit(jax.vmap(lambda f: preprocess(model, f)))(frames)
    params = quantize_vit_params(
        vit_mod.init_vit(model.vit, jax.random.PRNGKey(0)),
        cfg=model.vit, calib_images=calib, layer=cfg.layer)

    _stage("quantize done; goal compile")
    goal = jax.jit(lambda p, f: goal_descriptors(p, model, f))(params, frames[0])
    jax.block_until_ready(goal)

    def make_chain(n):
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
            idx = jnp.arange(n)
            _, vs = jax.lax.scan(
                body, (jnp.zeros(6), jnp.zeros((), bool), jnp.zeros(6)),
                (idx, keys))
            return vs

        return run

    chains = {n: make_chain(n) for n in (CHAIN_SHORT, CHAIN_LONG)}
    for n, fn in chains.items():
        _stage(f"servo chain {n} compile")
        np.asarray(fn(params, goal, frames, depth, jax.random.PRNGKey(0)))

    def make_norm_chain(n):
        @jax.jit
        def run(ws, x):
            def body(carry, i):
                w = jax.lax.dynamic_index_in_dim(ws, i % ws.shape[0], 0,
                                                 keepdims=False)
                return jnp.tanh(carry @ w), ()

            out, _ = jax.lax.scan(body, x, jnp.arange(n))
            # a scalar that depends on every step: np.asarray on it forces
            # the whole chain on-device (block_until_ready alone does not
            # synchronize through the axon relay — measured impossibly fast)
            return out[0, 0].astype(jnp.float32)

        return run

    nrng = np.random.default_rng(7)
    norm_ws = jax.device_put(jnp.asarray(
        nrng.standard_normal((3, NORM_DIM, NORM_DIM)) / np.sqrt(NORM_DIM),
        jnp.bfloat16))
    norm_x = jax.device_put(jnp.asarray(
        nrng.standard_normal((NORM_DIM, NORM_DIM)), jnp.bfloat16))
    norm_chains = {n: make_norm_chain(n) for n in (NORM_SHORT, NORM_LONG)}
    for n, fn in norm_chains.items():
        _stage(f"norm chain {n} compile")
        np.asarray(fn(norm_ws, norm_x))

    # INTERLEAVED reps: the axon tunnel / shared chip drifts 10-20% between
    # measurement windows (r2/r3 lesson — separate-process captures of the
    # identical graph drifted 1.93 -> 2.8 ms/iter).  Timing the short and
    # long chain back-to-back inside each rep and taking the best PAIRED
    # slope keeps both endpoints in the same drift window.
    _stage("timing reps")
    per_iter = float("inf")
    servo_slopes = []
    norm_slopes = []
    for r in range(REPS):
        ts = {}
        for n, fn in chains.items():
            t0 = time.perf_counter()
            np.asarray(fn(params, goal, frames, depth, jax.random.PRNGKey(r + 1)))
            ts[n] = time.perf_counter() - t0
        slope = (ts[CHAIN_LONG] - ts[CHAIN_SHORT]) / (CHAIN_LONG - CHAIN_SHORT)
        servo_slopes.append(slope)
        per_iter = min(per_iter, slope)
        # normalizer timed inside the same rep => same drift window
        nts = {}
        for n, fn in norm_chains.items():
            t0 = time.perf_counter()
            np.asarray(fn(norm_ws, norm_x))
            nts[n] = time.perf_counter() - t0
        norm_slopes.append(
            (nts[NORM_LONG] - nts[NORM_SHORT]) / (NORM_LONG - NORM_SHORT))
    hz_best = 1.0 / max(per_iter, 1e-9)
    hz_median = 1.0 / max(float(np.median(servo_slopes)), 1e-9)
    short = model_name.removeprefix("dinov2_")
    return {
        "metric": metric or f"servo_hz_{short}_{input_size}",
        # value = the MEDIAN-rep rate (r4 verdict: a best-of-N minimum
        # against a threshold invites lucky-rep victories — the defensible
        # top-line number is the typical rate, best-rep is the companion)
        "value": round(hz_median, 2),
        "unit": "Hz",
        "vs_baseline": round(hz_median / 500.0, 4),
        # chip-window marker: constant-work bf16 2048^3 matmul-chain step
        # time (ms).  Compare across BENCH_r*.json to separate real graph
        # improvements from chip/tunnel drift.
        # median, not min: the normalizer characterizes the TYPICAL window,
        # not the best-case rep
        "chip_norm_ms": round(float(np.median(norm_slopes)) * 1e3, 4),
        # best paired slope across reps (the r1-r4 `value` semantics)
        "hz_best": round(hz_best, 2),
        "hz_median": round(hz_median, 2),
        "kv_pool": kv_pool,
        # serving-graph fingerprint (cross-round comparisons should key on
        # these, not just the metric name — r4 advisor finding)
        "kv_pool_where": kv_pool_where,
        "patch_embed": vit_over.get("patch_embed_impl", "reshape"),
    }


def main():
    print(json.dumps(run_bench(metric="servo_hz_vitb14_518")))


if __name__ == "__main__":
    main()
