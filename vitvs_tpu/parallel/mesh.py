"""Device-mesh sharding for batched multi-environment evaluation.

The reference has no parallelism at all: 500 episodes run one-at-a-time in a
Python loop against a single Gazebo instance (vitvs_v2.py:1434-1481, SURVEY
§2.3).  Here the environment IS a pure function, so the whole benchmark is a
``vmap`` over episodes sharded across a ``jax.sharding.Mesh``:

* **dp** — environments (episodes) shard across data-parallel devices; zero
  communication during a rollout.
* **tp** — the ViT's attention heads and MLP hidden dimension shard across
  tensor-parallel devices for large models (ViT-L/g); XLA inserts the
  all-reduces on the attention-proj and fc2 contractions automatically from
  the NamedSharding annotations, riding ICI.

PP/SP/EP are deliberately not used: a <=40-block ViT fits one chip (PP n/a),
sequences are <=1370 tokens (SP n/a), and there are no experts (EP n/a) —
see SURVEY §2.3's strategy table.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitvs_tpu.harness.pipeline import ServoModel, servo_step
from vitvs_tpu.harness.rollout import rollout_episode


def make_mesh(n_devices: int | None = None, tp: int = 1,
              devices=None) -> Mesh:
    """(dp, tp) mesh over the first `n_devices` devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.array(devices[:n]).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_vit_params(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel layout for the stacked-block ViT params.

    Head-sharded attention + hidden-sharded MLP (Megatron layout):
      qkv_kernel  (L, D, 3, h, hd) -> shard the HEAD axis     over tp
      proj_kernel (L, D, D)        -> shard input dim         over tp
      fc1_kernel  (L, D, H)        -> shard hidden (out) dim  over tp
      fc2_kernel  (L, H, D)        -> shard hidden (in) dim   over tp
    Biases of tp-sharded outputs shard likewise; everything else replicates.

    The qkv head axis only exists in the head-major storage (vit.init_vit /
    models/convert.py).  Legacy flat (L, D, 3D) checkpoints fall back to
    sharding the flat [q|k|v] column dim — semantically correct but the
    split lands mid-K/mid-V, so GSPMD all-gathers the qkv activation in
    every block; re-save through convert for the aligned layout.
    """
    def spec_for(name: str, arr) -> P:
        if name == "qkv_kernel":
            return (P(None, None, None, "tp", None) if arr.ndim == 5
                    else P(None, None, "tp"))
        if name == "qkv_bias":
            return (P(None, None, "tp", None) if arr.ndim == 4
                    else P(None, "tp"))
        return {
            "proj_kernel": P(None, "tp", None),
            "fc1_kernel": P(None, None, "tp"),
            "fc1_bias": P(None, "tp"),
            "fc2_kernel": P(None, "tp", None),
        }.get(name, P())

    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = {
                bk: jax.device_put(bv, NamedSharding(mesh, spec_for(bk, bv)))
                for bk, bv in v.items()
            }
        else:
            out[k] = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), v
            )
    return out


def batch_servo_step(params, model: ServoModel, mesh: Mesh):
    """Jitted batched servo step with envs sharded over dp.

    Returns fn(goal_desc (B,t,d), rgb (B,H,W,3), depth (B,H,W), ema_value
    (B,6), ema_init (B,), prev_v (B,6), keys (B,2)) -> StepResult batch.
    """
    from vitvs_tpu.control import EmaState

    env_sharding = NamedSharding(mesh, P("dp"))

    def step(goal_desc, rgb, depth, ema_value, ema_init, prev_v, keys):
        def one(gd, r, d, ev, ei, pv, k):
            return servo_step(params, model, gd, r, d, EmaState(ev, ei), pv, k)

        return jax.vmap(one)(goal_desc, rgb, depth, ema_value, ema_init, prev_v, keys)

    return jax.jit(
        step,
        in_shardings=(env_sharding,) * 7,
    )


def sharded_batch_rollout(params, model: ServoModel, scene, mesh: Mesh,
                          num_steps: int | None = None):
    """Jitted vmapped closed-loop rollout with episodes sharded over dp."""
    env_sharding = NamedSharding(mesh, P("dp"))

    def run(goal_desc, starts, quats, keys):
        return jax.vmap(
            lambda sp, sq, k: rollout_episode(
                params, model, scene, goal_desc, sp, sq, k, num_steps=num_steps
            )
        )(starts, quats, keys)

    return jax.jit(
        run,
        in_shardings=(NamedSharding(mesh, P()), env_sharding, env_sharding, env_sharding),
    )
