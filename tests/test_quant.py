"""int8 W8A8 serving-path tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitvs_tpu.models import vit as vit_mod
from vitvs_tpu.models.extractor import extract_descriptors
from vitvs_tpu.models.quant import quantize_vit_params, _quantize_weight

RNG = np.random.default_rng(55)


def _real_scale_params(cfg, seed=0):
    """Random params with LayerScale ~ 1 so blocks actually transform the
    tokens (DINOv2's trained gammas are O(1); the 1e-5 init would mask
    quantization error)."""
    params = vit_mod.init_vit(cfg, jax.random.PRNGKey(seed))
    params["blocks"]["ls1"] = jnp.ones_like(params["blocks"]["ls1"])
    params["blocks"]["ls2"] = jnp.ones_like(params["blocks"]["ls2"])
    return params


def test_weight_quantization_roundtrip():
    w = jnp.asarray(RNG.standard_normal((4, 16, 8)).astype(np.float32))
    q, s = _quantize_weight(w)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
    assert rel < 0.005  # int8 per-channel: ~0.2% RMS


@pytest.mark.parametrize("facet", ["token", "key", "value"])
@pytest.mark.parametrize("ffn", ["mlp", "swiglu"])
def test_quantized_descriptors_close_to_fp(facet, ffn):
    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=192, depth=4, num_heads=3,
                            pos_grid=16, stride=14, model_name="tiny", ffn=ffn,
                            quant_attn="none")
    params = _real_scale_params(cfg)
    qp = quantize_vit_params(params)
    img = jnp.asarray(RNG.random((1, 154, 154, 3)), jnp.float32)
    ref = np.asarray(extract_descriptors(params, cfg, img, layer=3, facet=facet,
                                         bin=False, compute_dtype=jnp.float32))[0, 0]
    out = np.asarray(extract_descriptors(qp, cfg, img, layer=3, facet=facet,
                                         bin=False, compute_dtype=jnp.float32,
                                         quantized=True))[0, 0]
    # per-token cosine similarity is what matching consumes
    cos = (ref * out).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                 * np.linalg.norm(out, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos.min()


@pytest.mark.parametrize("alpha", [0.0, 0.5])
def test_static_calibrated_scales_close_to_fp(alpha):
    """SmoothQuant-folded static qkv/fc1 scales must preserve descriptors
    like the dynamic path does (calibration images = serving images here)."""
    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=192, depth=4, num_heads=3,
                            pos_grid=16, stride=14, model_name="tiny")
    params = _real_scale_params(cfg)
    img = jnp.asarray(RNG.random((2, 154, 154, 3)), jnp.float32)
    qp = quantize_vit_params(params, cfg=cfg, calib_images=img, layer=3,
                             smooth_alpha=alpha)
    # (L, 4): static scales for all four int8 matmul inputs
    # [qkv, fc1, proj, fc2]
    assert qp["blocks"]["act_scales"].shape == (4, 4)
    ref = np.asarray(extract_descriptors(params, cfg, img, layer=3, facet="token",
                                         bin=False, compute_dtype=jnp.float32))[0, 0]
    out = np.asarray(extract_descriptors(qp, cfg, img, layer=3, facet="token",
                                         bin=False, compute_dtype=jnp.float32,
                                         quantized=True))[0, 0]
    cos = (ref * out).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                 * np.linalg.norm(out, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos.min()


@pytest.mark.parametrize("mode", ["pv", "qk+pv", "fused", "nomax", "nomax2", "nomax3"])
def test_int8_attention_close_to_fp(mode):
    """int8 probs@V (row-max trick), int8 QK^T, and the fused Pallas kernel
    (run in interpreter mode on CPU) must preserve descriptors."""
    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=192, depth=4, num_heads=3,
                            pos_grid=16, stride=14, model_name="tiny",
                            quant_attn=mode,
                            attn_impl="xla-interpret" if mode == "fused" else "xla")
    params = _real_scale_params(cfg)
    qp = quantize_vit_params(params)
    img = jnp.asarray(RNG.random((1, 154, 154, 3)), jnp.float32)
    ref = np.asarray(extract_descriptors(params, cfg, img, layer=3, facet="token",
                                         bin=False, compute_dtype=jnp.float32))[0, 0]
    out = np.asarray(extract_descriptors(qp, cfg, img, layer=3, facet="token",
                                         bin=False, compute_dtype=jnp.float32,
                                         quantized=True))[0, 0]
    cos = (ref * out).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                 * np.linalg.norm(out, axis=-1) + 1e-12)
    assert cos.min() > 0.99, cos.min()


def test_smoothquant_folding_is_exact_at_fp():
    """Folding s into LN scale/bias and weight rows must leave the fp matmul
    output unchanged: compare static-quantized vs dynamic-quantized outputs
    (both int8 — any folding error would show as a systematic offset)."""
    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=192, depth=2, num_heads=3,
                            pos_grid=16, stride=14, model_name="tiny")
    params = _real_scale_params(cfg)
    img = jnp.asarray(RNG.random((1, 112, 112, 3)), jnp.float32)
    qp_dyn = quantize_vit_params(params)
    qp_sta = quantize_vit_params(params, cfg=cfg, calib_images=img, layer=1)
    a = np.asarray(extract_descriptors(qp_dyn, cfg, img, layer=1, facet="token",
                                       bin=False, compute_dtype=jnp.float32,
                                       quantized=True))[0, 0]
    b = np.asarray(extract_descriptors(qp_sta, cfg, img, layer=1, facet="token",
                                       bin=False, compute_dtype=jnp.float32,
                                       quantized=True))[0, 0]
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-12)
    assert cos.min() > 0.99, cos.min()


def test_quantized_attn_facet_rows_sum_to_one():
    from vitvs_tpu.models.quant import vit_features_quant

    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=96, depth=2, num_heads=3,
                            pos_grid=16, stride=14, model_name="tiny")
    qp = quantize_vit_params(_real_scale_params(cfg))
    img = jnp.asarray(RNG.random((1, 56, 56, 3)), jnp.float32)
    attn = vit_features_quant(qp, cfg, img, layer=1, facet="attn",
                              compute_dtype=jnp.float32)
    t = 1 + 4 * 4
    assert attn.shape == (1, 3, t, t)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_quantized_matching_agrees_with_fp():
    """The nearest-neighbour structure (what the controller consumes) must
    survive quantization on a realistic scene."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rollout import GOAL_POS, GOAL_QUAT
    from vitvs_tpu.sim import Scene, make_synthetic_poster, observe
    from vitvs_tpu.core.camera import CameraIntrinsics
    from vitvs_tpu.core import se3
    from vitvs_tpu.match import cosine_similarity_matrix
    from vitvs_tpu.core.image import preprocess_frame

    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=192, depth=2, num_heads=3,
                            pos_grid=16, stride=14, model_name="tiny")
    params = _real_scale_params(cfg)
    qp = quantize_vit_params(params)
    cam = CameraIntrinsics(width=128, height=128, fx=100.5, fy=100.5)
    scene = Scene.create(make_synthetic_poster(256, seed=3))
    rgb1, _ = observe(scene, cam, GOAL_POS, GOAL_QUAT)
    rgb2, _ = observe(scene, cam, GOAL_POS + jnp.array([0.03, 0.0, 0.05]), GOAL_QUAT)

    def descs(p, quant):
        out = []
        for rgb in (rgb1, rgb2):
            x = preprocess_frame(rgb, 112)[None]
            out.append(extract_descriptors(p, cfg, x, layer=1, facet="token",
                                           bin=True, compute_dtype=jnp.float32,
                                           quantized=quant)[0, 0])
        return out

    d1, d2 = descs(params, False)
    q1, q2 = descs(qp, True)
    nn_fp = np.asarray(jnp.argmax(cosine_similarity_matrix(d1, d2), axis=1))
    nn_q = np.asarray(jnp.argmax(cosine_similarity_matrix(q1, q2), axis=1))
    agreement = (nn_fp == nn_q).mean()
    assert agreement > 0.9, agreement


def test_quantized_rejects_unknown_facet():
    from vitvs_tpu.models.quant import vit_features_quant

    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=96, depth=1, num_heads=3,
                            pos_grid=16, stride=14)
    qp = quantize_vit_params(vit_mod.init_vit(cfg, jax.random.PRNGKey(0)))
    img = jnp.zeros((1, 56, 56, 3))
    with pytest.raises(ValueError):
        vit_features_quant(qp, cfg, img, layer=0, facet="bogus")


def test_static_calibrated_serving_velocities_match_dynamic():
    """The static-calibrated serving configuration (per-tensor activation
    scales + SmoothQuant fold — the bench.py config) must produce servo
    velocities equivalent to the dynamic-scale int8 path through the FULL
    pipeline, when calibrated on frames from the same distribution."""
    import dataclasses
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rollout import tiny_setup
    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import (goal_descriptors, preprocess,
                                            servo_step)

    params, model, scene = tiny_setup(pixel_identity=True)
    m = dataclasses.replace(model, quantized=True)

    rng = np.random.default_rng(11)
    goal_rgb = jnp.asarray(rng.random((128, 128, 3)), jnp.float32)
    cur_rgb = jnp.asarray(np.clip(np.asarray(goal_rgb)
                                  + rng.normal(0, 0.05, (128, 128, 3)), 0, 1),
                          jnp.float32)
    calib = jnp.stack([preprocess(m, goal_rgb), preprocess(m, cur_rgb)])
    qp_dyn = quantize_vit_params(params)
    qp_cal = quantize_vit_params(params, cfg=m.vit, calib_images=calib,
                                 layer=m.cfg.layer)
    assert "act_scales" in qp_cal["blocks"]

    depth = jnp.full((128, 128), 0.61, jnp.float32)
    ema = EmaState(jnp.zeros(6), jnp.zeros((), bool))
    prev = jnp.zeros(6)
    key = jax.random.PRNGKey(0)

    outs = {}
    for name, qp in (("dyn", qp_dyn), ("cal", qp_cal)):
        goal = goal_descriptors(qp, m, goal_rgb)
        outs[name] = servo_step(qp, m, goal, cur_rgb, depth, ema, prev, key)
    vd = np.asarray(outs["dyn"].v_c)
    vc = np.asarray(outs["cal"].v_c)
    assert bool(outs["cal"].feature_ok) == bool(outs["dyn"].feature_ok)
    scale = max(np.abs(vd).max(), 1e-6)
    np.testing.assert_allclose(vc, vd, atol=0.08 * scale)


def test_source_quantized_bins_velocities_match_materialized():
    """fused_bin_quant (quantize the binned descriptors at the source —
    match/binned.quantize_binned_int8, no bf16 binned tensor) must produce
    servo velocities equivalent to the materialize-then-quantize int8 path
    through the FULL pipeline.  The int8 values are identical by
    construction (test_match.py), so the only divergence is where bf16
    rounding lands on the materialized rows."""
    import dataclasses
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rollout import tiny_setup
    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import goal_descriptors, servo_step

    params, model, scene = tiny_setup(pixel_identity=True)
    qp = quantize_vit_params(params)
    fused = dataclasses.replace(model, quantized=True, fused_bin_quant=True)
    mat = dataclasses.replace(model, quantized=True, fused_bin_quant=False)
    assert fused.source_quantized_bins and not mat.source_quantized_bins

    rng = np.random.default_rng(7)
    goal_rgb = jnp.asarray(rng.random((128, 128, 3)), jnp.float32)
    cur_rgb = jnp.asarray(np.clip(np.asarray(goal_rgb)
                                  + rng.normal(0, 0.05, (128, 128, 3)), 0, 1),
                          jnp.float32)
    depth = jnp.full((128, 128), 0.61, jnp.float32)
    ema = EmaState(jnp.zeros(6), jnp.zeros((), bool))
    prev = jnp.zeros(6)
    key = jax.random.PRNGKey(0)

    outs = {}
    for name, m in (("fused", fused), ("mat", mat)):
        goal = goal_descriptors(qp, m, goal_rgb)
        outs[name] = servo_step(qp, m, goal, cur_rgb, depth, ema, prev, key)
    vm = np.asarray(outs["mat"].v_c)
    vf = np.asarray(outs["fused"].v_c)
    assert bool(outs["fused"].feature_ok) == bool(outs["mat"].feature_ok)
    assert int(outs["fused"].num_valid) == int(outs["mat"].num_valid)
    scale = max(np.abs(vm).max(), 1e-6)
    np.testing.assert_allclose(vf, vm, atol=0.05 * scale)


def test_serving_fastpath_velocities_match_baseline():
    """The production serving configuration (quant_attn='nomax3' + conv
    patch embed + pp_precision='default' — bench.py's graph) must produce
    servo velocities equivalent to the validated int8 baseline through the
    FULL pipeline."""
    import dataclasses
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rollout import tiny_setup
    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import goal_descriptors, servo_step

    params, model, scene = tiny_setup(pixel_identity=True)
    base = dataclasses.replace(model, quantized=True)
    qp = quantize_vit_params(params)
    fast = dataclasses.replace(
        base, pp_precision="default",
        vit=dataclasses.replace(base.vit, quant_attn="nomax3",
                                patch_embed_impl="conv"))

    rng = np.random.default_rng(3)
    goal_rgb = jnp.asarray(rng.random((128, 128, 3)), jnp.float32)
    cur_rgb = jnp.asarray(np.clip(np.asarray(goal_rgb)
                                  + rng.normal(0, 0.05, (128, 128, 3)), 0, 1),
                          jnp.float32)
    depth = jnp.full((128, 128), 0.61, jnp.float32)
    ema = EmaState(jnp.zeros(6), jnp.zeros((), bool))
    prev = jnp.zeros(6)
    key = jax.random.PRNGKey(0)

    outs = {}
    for name, m in (("base", base), ("fast", fast)):
        goal = goal_descriptors(qp, m, goal_rgb)
        outs[name] = servo_step(qp, m, goal, cur_rgb, depth, ema, prev, key)
    vb = np.asarray(outs["base"].v_c)
    vf = np.asarray(outs["fast"].v_c)
    scale = max(np.abs(vb).max(), 1e-6)
    assert bool(outs["fast"].feature_ok) == bool(outs["base"].feature_ok)
    np.testing.assert_allclose(vf, vb, atol=0.05 * scale)
