"""Descriptor fine-tuning tests: geometric supervision + learning progress."""

import numpy as np
import jax
import jax.numpy as jnp

from vitvs_tpu.harness.pipeline import ServoModel
from vitvs_tpu.io_bridge.config import VSConfig
from vitvs_tpu.models import vit as vit_mod
from vitvs_tpu.sim import Scene, make_synthetic_poster
from vitvs_tpu.train import (
    geometric_correspondences,
    make_pair_batch,
    train_descriptor_model,
)

GOAL_POS = jnp.array([0.0, 0.0, 0.61])
GOAL_QUAT = jnp.array([0.0, 0.7071068, 0.0, 0.7071068])


def _setup():
    cfg = VSConfig(u_max=128, v_max=128, f_x=100.5, f_y=100.5,
                   dino_input_size=112, model_name="tiny", layer=1,
                   use_feature_binning=False)
    vcfg = vit_mod.ViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=2,
                             pos_grid=16, stride=14, model_name="tiny")
    model = ServoModel(vit=vcfg, cfg=cfg, compute_dtype=jnp.float32)
    params = vit_mod.init_vit(vcfg, jax.random.PRNGKey(0))
    scene = Scene.create(make_synthetic_poster(256, seed=3))
    return params, model, scene


def test_identity_correspondence():
    """Same pose -> every on-poster patch maps to itself."""
    _, model, scene = _setup()
    idx, valid = geometric_correspondences(model, scene, GOAL_POS, GOAL_QUAT,
                                           GOAL_POS, GOAL_QUAT)
    t = model.grid()[0] * model.grid()[1]
    assert idx.shape == (t,)
    v = np.asarray(valid)
    assert v.sum() > t // 2  # poster fills most of the view at the goal
    np.testing.assert_array_equal(np.asarray(idx)[v], np.arange(t)[v])


def test_translated_correspondence_shifts():
    """Camera shifted +x world by one patch footprint -> rows shift by ~1."""
    _, model, scene = _setup()
    gh, gw = model.grid()
    # patch footprint at 0.605 m: (128/112*14)px * z/f = 16 * 0.605/100.5 m
    dx = 16 * 0.605 / 100.5
    idx, valid = geometric_correspondences(
        model, scene, GOAL_POS, GOAL_QUAT,
        GOAL_POS + jnp.array([dx, 0, 0]), GOAL_QUAT)
    v = np.asarray(valid)
    src = np.arange(gh * gw)[v]
    dst = np.asarray(idx)[v]
    # +x world moves content DOWN in the image of B relative to A:
    # the patch seen at row r in A appears at row r+1 in B
    rows_shift = dst // gw - src // gw
    assert np.median(rows_shift) == 1.0, np.median(rows_shift)


def test_pair_batch_shapes():
    _, model, scene = _setup()
    batch = make_pair_batch(model, scene, jax.random.PRNGKey(0), batch=2)
    t = model.grid()[0] * model.grid()[1]
    s = model.cfg.dino_input_size
    assert batch["img_a"].shape == (2, s, s, 3)
    assert batch["idx"].shape == (2, t)
    assert bool(batch["valid"].sum() > 0)


def test_matching_quality_serves_the_quantized_path():
    """matching_quality must evaluate the ACTUAL serving path: with a
    quantized model it must run the int8 extraction + int8 match (it used
    to call the float branch and crash on the quantized param pytree)."""
    import dataclasses

    from vitvs_tpu.models.quant import quantize_vit_params
    from vitvs_tpu.train.finetune import matching_quality

    params, model, scene = _setup()
    f0, a0 = matching_quality(params, model, scene, jax.random.PRNGKey(0),
                              num_views=2)
    qmodel = dataclasses.replace(model, quantized=True)
    qparams = quantize_vit_params(params)
    f1, a1 = matching_quality(qparams, qmodel, scene, jax.random.PRNGKey(0),
                              num_views=2)
    for v in (f0, a0, f1, a1):
        assert np.isfinite(v) and 0.0 <= v <= 1.0
    # int8 serving tracks the float path's matcher behavior on this scene
    assert abs(f1 - f0) < 0.5


def test_training_reduces_loss():
    """A randomly initialized tiny ViT must learn matchable descriptors.
    (Chance level is ln(64) = 4.16; content priors start it at ~3.4 and 60
    steps of adamw at 3e-3 reach ~2.6 — assert a robust fraction of that.)"""
    params, model, scene = _setup()
    state, losses = train_descriptor_model(params, model, scene,
                                           steps=60, batch=4,
                                           learning_rate=3e-3, seed=1)
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.85 * first, (first, last)
    assert int(state.step) == 60


def test_remat_blocks_gradients_match():
    """ViTConfig.remat_blocks trades FLOPs for memory under reverse-mode AD
    (ViT-L@518 training OOMs a 16 GB chip without it) and must not change
    gradients."""
    import dataclasses

    from vitvs_tpu.models import vit as vit_mod

    cfg = vit_mod.ViTConfig(patch_size=14, embed_dim=64, depth=3, num_heads=4,
                            pos_grid=8, stride=14, model_name="tiny")
    params = vit_mod.init_vit(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0).random((2, 56, 56, 3)),
                       jnp.float32)

    def loss(p, c):
        f = vit_mod.vit_features(p, c, imgs, layer=2, facet="token")
        return jnp.sum(f ** 2)

    g1 = jax.grad(loss)(params, cfg)
    g2 = jax.grad(loss)(params, dataclasses.replace(cfg, remat_blocks=True))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
