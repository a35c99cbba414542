"""Mesh-sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from vitvs_tpu.parallel import (
    batch_servo_step,
    make_mesh,
    replicate,
    shard_vit_params,
    sharded_batch_rollout,
)
from vitvs_tpu.harness.pipeline import goal_descriptors


@pytest.fixture(scope="module")
def tiny():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rollout import tiny_setup, GOAL_POS, GOAL_QUAT
    from vitvs_tpu.sim import observe

    params, model, scene = tiny_setup(max_iterations=10)
    goal_rgb, _ = observe(scene, model.camera, GOAL_POS, GOAL_QUAT)
    return params, model, scene, goal_rgb, GOAL_POS, GOAL_QUAT


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_shard_vit_params_layout(tiny):
    params, model, *_ = tiny
    mesh = make_mesh(8, tp=2)
    sharded = shard_vit_params(params, mesh)
    qkv = sharded["blocks"]["qkv_kernel"]
    # sharded over tp on the output dim
    spec = qkv.sharding.spec
    assert spec == P(None, None, "tp")
    np.testing.assert_array_equal(np.asarray(qkv), np.asarray(params["blocks"]["qkv_kernel"]))


def test_batch_servo_step_dp_tp(tiny):
    params, model, scene, goal_rgb, GOAL_POS, GOAL_QUAT = tiny
    from vitvs_tpu.sim import observe

    mesh = make_mesh(8, tp=2)  # dp=4, tp=2
    sharded_params = shard_vit_params(params, mesh)
    B = 8
    rgb, depth = observe(scene, model.camera, GOAL_POS, GOAL_QUAT)
    rgbs = jnp.broadcast_to(rgb, (B,) + rgb.shape)
    depths = jnp.broadcast_to(depth, (B,) + depth.shape)
    goal = goal_descriptors(params, model, rgb)
    goals = jnp.broadcast_to(goal, (B,) + goal.shape)

    dp = NamedSharding(mesh, P("dp"))
    args = jax.tree.map(lambda x: jax.device_put(x, dp), (
        goals, rgbs, depths,
        jnp.zeros((B, 6), jnp.float32),
        jnp.zeros((B,), bool),
        jnp.zeros((B, 6), jnp.float32),
        jax.random.split(jax.random.PRNGKey(0), B),
    ))
    step = batch_servo_step(sharded_params, model, mesh)
    res = step(*args)
    assert res.v_c.shape == (B, 6)
    # same-image inputs => near-zero commands on every env
    np.testing.assert_allclose(np.asarray(res.v_c), 0.0, atol=1e-3)


def test_sharded_batch_rollout(tiny):
    params, model, scene, goal_rgb, GOAL_POS, GOAL_QUAT = tiny
    mesh = make_mesh(8, tp=1)  # pure dp
    B = 8
    goal = goal_descriptors(params, model, goal_rgb)
    starts = jnp.asarray(np.asarray(GOAL_POS) +
                         np.random.default_rng(0).uniform(-0.05, 0.05, (B, 3)),
                         jnp.float32)
    quats = jnp.broadcast_to(jnp.asarray(GOAL_QUAT), (B, 4))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    dp = NamedSharding(mesh, P("dp"))
    starts, quats, keys = (jax.device_put(x, dp) for x in (starts, quats, keys))
    goal = jax.device_put(goal, NamedSharding(mesh, P()))
    run = sharded_batch_rollout(replicate(params, mesh), model, scene, mesh,
                                num_steps=5)
    res = run(goal, starts, quats, keys)
    assert res.position_history.shape == (B, 5, 3)
    assert res.error_history.shape == (B, 5, 2)
