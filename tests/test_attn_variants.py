"""Serving-oriented attention redesigns: relu/sqrelu scores and K/V pooling.

These are opt-in departures from reference parity (ViTConfig.attn_score /
.kv_pool) that exist purely for TPU serving speed — docs/ROOFLINE.md shows
the attention fusion is VPU-exp- and MXU-bound, and these variants delete
that work.  They change the function, so the contract tested here is:
  * the pooling math is exactly a patch-grid mean (incl. odd-grid edges),
  * the int8 serving path computes the SAME variant function as the f32
    training path (descriptor cosine / full-pipeline velocity equivalence),
  * the variants genuinely change the attention output vs softmax (no
    silent fall-through to the parity path),
  * gradients flow for in-sim fine-tuning (scripts/train_servo.py).
"""

import dataclasses
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitvs_tpu.models import vit as vit_mod
from vitvs_tpu.models.extractor import extract_descriptors
from vitvs_tpu.models.quant import quantize_vit_params

RNG = np.random.default_rng(91)


def _real_scale_params(cfg, seed=0):
    params = vit_mod.init_vit(cfg, jax.random.PRNGKey(seed))
    params["blocks"]["ls1"] = jnp.ones_like(params["blocks"]["ls1"])
    params["blocks"]["ls2"] = jnp.ones_like(params["blocks"]["ls2"])
    return params


def _tiny_cfg(**kw):
    base = dict(patch_size=14, embed_dim=192, depth=4, num_heads=3,
                pos_grid=16, stride=14, model_name="tiny")
    base.update(kw)
    return vit_mod.ViTConfig(**base)


# ---------------------------------------------------------------------------
# _pool_kv
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("g,pool", [(4, 2), (5, 2), (7, 3), (37, 2)])
def test_pool_kv_is_exact_patch_grid_mean(g, pool):
    B, h, hd = 2, 3, 4
    t = jnp.asarray(RNG.standard_normal((B, 1 + g * g, h, hd)), jnp.float32)
    out = vit_mod._pool_kv(t, pool)
    nw = -(-g // pool)
    assert out.shape == (B, 1 + nw * nw, h, hd)
    # CLS row passes through untouched
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(t[:, 0]))
    # each pooled cell is the mean of its true (possibly clipped) window
    sp = np.asarray(t[:, 1:]).reshape(B, g, g, h, hd)
    for i in range(nw):
        for j in range(nw):
            win = sp[:, i * pool:(i + 1) * pool, j * pool:(j + 1) * pool]
            ref = win.mean(axis=(1, 2))
            got = np.asarray(out[:, 1 + i * nw + j])
            np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("g,pool", [(4, 2), (5, 2), (7, 3), (37, 2)])
def test_pool_kv_matmul_impl_matches_window(g, pool):
    # the 'matmul' impl (static pooling-matrix einsum, no grid reshapes) must
    # compute the same means as the 'window' reference impl
    B, h, hd = 2, 3, 4
    t = jnp.asarray(RNG.standard_normal((B, 1 + g * g, h, hd)), jnp.float32)
    ref = np.asarray(vit_mod._pool_kv(t, pool, "window"))
    got = np.asarray(vit_mod._pool_kv(t, pool, "matmul"))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    with pytest.raises(ValueError, match="kv_pool_impl"):
        vit_mod._pool_kv(t, pool, "nope")


@pytest.mark.parametrize("pool", [2, 3])
def test_prepool_matches_postpool_fp(pool):
    """kv_pool_where='pre' (pool tokens, then project K/V) is algebraically
    identical to project-then-pool: P@(XW) == (P@X)W and the mean rows sum
    to 1 so the bias passes through.  f32 forward must agree to float-
    association tolerance."""
    post = _tiny_cfg(kv_pool=pool, kv_pool_impl="matmul")
    pre = _tiny_cfg(kv_pool=pool, kv_pool_impl="matmul", kv_pool_where="pre")
    params = _real_scale_params(post)
    img = jnp.asarray(RNG.random((1, 154, 154, 3)), jnp.float32)
    a = np.asarray(extract_descriptors(params, post, img, layer=3,
                                       facet="token", bin=False,
                                       compute_dtype=jnp.float32))
    b = np.asarray(extract_descriptors(params, pre, img, layer=3,
                                       facet="token", bin=False,
                                       compute_dtype=jnp.float32))
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("acts", ["dynamic", "static"])
def test_prepool_int8_path_matches_postpool(acts):
    """The int8 serving pre-pool branch (models/quant._block_q: sliced
    qkv columns + shared act scale on the pooled tokens) computes the same
    function as post-pool up to int8 rounding."""
    post = _tiny_cfg(kv_pool=2, kv_pool_impl="matmul", quant_attn="nomax3")
    pre = dataclasses.replace(post, kv_pool_where="pre")
    params = _real_scale_params(post)
    img = jnp.asarray(RNG.random((1, 154, 154, 3)), jnp.float32)
    if acts == "static":
        qp = quantize_vit_params(params, cfg=post, calib_images=img, layer=3)
    else:
        qp = quantize_vit_params(params)
    a = np.asarray(extract_descriptors(qp, post, img, layer=3, facet="token",
                                       bin=False, compute_dtype=jnp.float32,
                                       quantized=True))[0, 0]
    b = np.asarray(extract_descriptors(qp, pre, img, layer=3, facet="token",
                                       bin=False, compute_dtype=jnp.float32,
                                       quantized=True))[0, 0]
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos.min()


def test_pool_kv_identity_and_nonsquare_guard():
    t = jnp.asarray(RNG.standard_normal((1, 1 + 9, 2, 4)), jnp.float32)
    assert vit_mod._pool_kv(t, 1) is t
    bad = jnp.asarray(RNG.standard_normal((1, 1 + 10, 2, 4)), jnp.float32)
    with pytest.raises(ValueError, match="square patch grid"):
        vit_mod._pool_kv(bad, 2)


# ---------------------------------------------------------------------------
# variant forwards: training path vs int8 serving path compute the same fn
# ---------------------------------------------------------------------------


VARIANTS = [("relu", 1), ("sqrelu", 1), ("softmax", 2), ("relu", 2)]


@pytest.mark.parametrize("score,pool", VARIANTS)
def test_variant_quant_path_matches_fp(score, pool):
    cfg = _tiny_cfg(attn_score=score, kv_pool=pool, quant_attn="none")
    params = _real_scale_params(cfg)
    qp = quantize_vit_params(params)
    img = jnp.asarray(RNG.random((1, 154, 154, 3)), jnp.float32)
    ref = np.asarray(extract_descriptors(params, cfg, img, layer=3,
                                         facet="token", bin=False,
                                         compute_dtype=jnp.float32))[0, 0]
    out = np.asarray(extract_descriptors(qp, cfg, img, layer=3, facet="token",
                                         bin=False, compute_dtype=jnp.float32,
                                         quantized=True))[0, 0]
    cos = (ref * out).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                 * np.linalg.norm(out, axis=-1) + 1e-12)
    # sqrelu squares the scores, roughly doubling relative int8 noise vs the
    # softmax modes' 0.99 bar; matching behavior is gated by the velocity
    # test below
    assert cos.min() > 0.98, cos.min()


@pytest.mark.parametrize("score,pool", VARIANTS)
def test_variant_changes_the_function(score, pool):
    """Guard against a silent fall-through to the softmax parity path."""
    base = _tiny_cfg()
    cfg = _tiny_cfg(attn_score=score, kv_pool=pool)
    params = _real_scale_params(base)
    img = jnp.asarray(RNG.random((1, 112, 112, 3)), jnp.float32)
    a = np.asarray(extract_descriptors(params, base, img, layer=3,
                                       facet="token", bin=False,
                                       compute_dtype=jnp.float32))
    b = np.asarray(extract_descriptors(params, cfg, img, layer=3,
                                       facet="token", bin=False,
                                       compute_dtype=jnp.float32))
    assert np.abs(a - b).max() > 1e-4


def test_variant_static_calibration_runs_and_matches():
    """Static per-tensor activation scales calibrate THROUGH the variant
    forward (models/quant._collect_act_amax mirrors it)."""
    cfg = _tiny_cfg(attn_score="relu", kv_pool=2)
    params = _real_scale_params(cfg)
    img = jnp.asarray(RNG.random((2, 154, 154, 3)), jnp.float32)
    qp = quantize_vit_params(params, cfg=cfg, calib_images=img, layer=3)
    assert "act_scales" in qp["blocks"]
    ref = np.asarray(extract_descriptors(params, cfg, img, layer=3,
                                         facet="token", bin=False,
                                         compute_dtype=jnp.float32))[0, 0]
    out = np.asarray(extract_descriptors(qp, cfg, img, layer=3, facet="token",
                                         bin=False, compute_dtype=jnp.float32,
                                         quantized=True))[0, 0]
    cos = (ref * out).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                 * np.linalg.norm(out, axis=-1) + 1e-12)
    # per-tensor static scales are coarser than per-token dynamic ones;
    # worst token here sits at ~0.977 (vs >0.999 for 99% of tokens)
    assert cos.min() > 0.97, cos.min()


def test_unknown_attn_score_raises():
    """A typo'd attn_score (YAML configs are unvalidated strings) must
    raise, not silently serve relu attention on softmax-trained weights."""
    cfg = _tiny_cfg(attn_score="softmx", embed_dim=96, depth=2)
    params = _real_scale_params(cfg)
    img = jnp.asarray(RNG.random((1, 56, 56, 3)), jnp.float32)
    with pytest.raises(ValueError, match="unknown attn_score"):
        jax.block_until_ready(
            extract_descriptors(params, cfg, img, layer=1, facet="token",
                                bin=False, compute_dtype=jnp.float32))


def test_variant_rejects_incompatible_quant_attn():
    img = jnp.asarray(RNG.random((1, 56, 56, 3)), jnp.float32)
    for mode in ("pv", "fused"):
        cfg = _tiny_cfg(attn_score="relu", quant_attn=mode, embed_dim=96,
                        depth=2)
        qp = quantize_vit_params(_real_scale_params(cfg))
        with pytest.raises(ValueError, match="compose"):
            jax.block_until_ready(
                extract_descriptors(qp, cfg, img, layer=1, facet="token",
                                    bin=False, compute_dtype=jnp.float32,
                                    quantized=True))


def test_variant_gradients_flow():
    """In-sim fine-tuning needs d(descriptors)/d(params) through the
    variant attention (relu has a kink; pooled windows share gradients)."""
    cfg = _tiny_cfg(attn_score="sqrelu", kv_pool=2, embed_dim=96, depth=2)
    params = _real_scale_params(cfg)
    img = jnp.asarray(RNG.random((1, 56, 56, 3)), jnp.float32)

    def loss(p):
        d = extract_descriptors(p, cfg, img, layer=1, facet="token",
                                bin=False, compute_dtype=jnp.float32)
        return jnp.sum(d * d)

    g = jax.grad(loss)(params)
    gn = float(jnp.linalg.norm(g["blocks"]["qkv_kernel"]))
    assert np.isfinite(gn) and gn > 0


# ---------------------------------------------------------------------------
# full-pipeline velocity equivalence (fp vs int8 serving at the variant)
# ---------------------------------------------------------------------------


def test_variant_serving_velocities_match_fp():
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rollout import tiny_setup
    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import goal_descriptors, servo_step

    params, model, scene = tiny_setup(pixel_identity=True)
    variant_vit = dataclasses.replace(model.vit, attn_score="relu", kv_pool=2)
    fp = dataclasses.replace(model, vit=variant_vit)
    q = dataclasses.replace(model, vit=variant_vit, quantized=True)
    qp = quantize_vit_params(params)

    rng = np.random.default_rng(17)
    goal_rgb = jnp.asarray(rng.random((128, 128, 3)), jnp.float32)
    cur_rgb = jnp.asarray(np.clip(np.asarray(goal_rgb)
                                  + rng.normal(0, 0.05, (128, 128, 3)), 0, 1),
                          jnp.float32)
    depth = jnp.full((128, 128), 0.61, jnp.float32)
    ema = EmaState(jnp.zeros(6), jnp.zeros((), bool))
    prev = jnp.zeros(6)
    key = jax.random.PRNGKey(0)

    outs = {}
    for name, (m, p) in (("fp", (fp, params)), ("int8", (q, qp))):
        goal = goal_descriptors(p, m, goal_rgb)
        outs[name] = servo_step(p, m, goal, cur_rgb, depth, ema, prev, key)
    va = np.asarray(outs["fp"].v_c)
    vb = np.asarray(outs["int8"].v_c)
    assert bool(outs["int8"].feature_ok) == bool(outs["fp"].feature_ok)
    scale = max(np.abs(va).max(), 1e-6)
    np.testing.assert_allclose(vb, va, atol=0.08 * scale)
