"""Pixel-identity baseline model tests."""

import numpy as np
import jax
import jax.numpy as jnp

from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors
from vitvs_tpu.harness.rollout import pose_errors, rollout_episode
from vitvs_tpu.io_bridge.config import VSConfig
from vitvs_tpu.models.baselines import init_pixel_params, is_pixel_model, pixel_config
from vitvs_tpu.models.vit import make_config
from vitvs_tpu.sim import Scene, make_synthetic_poster, observe

GOAL_POS = jnp.array([0.0, 0.0, 0.61])
GOAL_QUAT = jnp.array([0.0, 0.7071068, 0.0, 0.7071068])


def test_pixel_config_parsing():
    assert is_pixel_model("pixel8") and not is_pixel_model("dinov2_vits14")
    cfg = pixel_config("pixel8")
    assert cfg.embed_dim == 192 and cfg.patch_size == 8
    assert make_config("pixel14").embed_dim == 14 * 14 * 3


def test_pixel_model_descriptors_are_patches():
    from vitvs_tpu.models.extractor import extract_descriptors

    cfg = pixel_config("pixel8")
    params = init_pixel_params(cfg)
    img = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    desc = np.asarray(extract_descriptors(params, cfg, img, layer=0, facet="token",
                                          bin=False, compute_dtype=jnp.float32))[0, 0]
    # descriptor of patch (0,0) ~ its raw pixels (block residual ~ 1e-8)
    patch = np.asarray(img[0, :8, :8, :]).reshape(-1)
    np.testing.assert_allclose(desc[0], patch, atol=1e-4)


def test_pixel_model_servo_converges():
    cfg = VSConfig(u_max=128, v_max=128, f_x=100.5, f_y=100.5,
                   dino_input_size=112, num_pairs=16, lambda_=0.5,
                   control_dt=0.1, ema_alpha=0.8, model_name="pixel8",
                   layer=0, pinv_mode="dls", max_iterations=120)
    model = ServoModel.create(cfg, compute_dtype=jnp.float32)
    params = init_pixel_params(model.vit)
    scene = Scene.create(make_synthetic_poster(256, seed=3))
    goal_rgb, _ = observe(scene, model.camera, GOAL_POS, GOAL_QUAT)
    gd = goal_descriptors(params, model, goal_rgb)
    start = GOAL_POS + jnp.asarray([0.10, -0.08, 0.15], jnp.float32)
    e0t, _ = pose_errors(start, GOAL_QUAT, GOAL_POS, GOAL_QUAT)
    run = jax.jit(lambda sp, sq, k: rollout_episode(
        params, model, scene, gd, sp, sq, k, num_steps=120))
    res = run(start, GOAL_QUAT, jax.random.PRNGKey(0))
    et = float(res.error_history[-1, 0])
    assert et < 0.5 * float(e0t), (et, float(e0t))
