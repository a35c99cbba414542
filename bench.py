"""Headline benchmark: closed-loop servo rate, ViT-B/14 @ 518^2, one chip.

Measures the full per-frame pipeline (preprocess 640x480 frame -> DINOv2-
style ViT-B/14 forward at 518^2 -> binned descriptors -> dense cosine match
-> IBVS velocity) as a SEQUENTIAL chain of servo iterations (each step's EMA
state feeds the next), i.e. true single-stream latency — the reference's
per-iteration wall time (vitvs_v2.py:630-632).

North star (BASELINE.md): >= 500 Hz on one TPU v5e chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vitvs_tpu.control import EmaState
    from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors, servo_step
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.models import vit as vit_mod

    cfg = VSConfig(dino_input_size=518, model_name="dinov2_vitb14", layer=11,
                   pinv_mode="dls")
    model = ServoModel.create(cfg, compute_dtype=jnp.bfloat16)
    params = vit_mod.init_vit(model.vit, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((cfg.v_max, cfg.u_max, 3)), jnp.float32)
    depth = jnp.full((cfg.v_max, cfg.u_max), 0.61, jnp.float32)

    goal = jax.jit(lambda p, f: goal_descriptors(p, model, f))(params, frame)

    chain = 20  # sequential servo iterations per timed call

    @jax.jit
    def run_chain(params, goal, frame, depth, key):
        def body(carry, k):
            ema_v, ema_i, prev = carry
            res = servo_step(params, model, goal, frame, depth,
                             EmaState(ema_v, ema_i), prev, k)
            return (res.ema.value, res.ema.initialized, res.v_c), res.v_c

        keys = jax.random.split(key, chain)
        (_, _, _), vs = jax.lax.scan(
            body, (jnp.zeros(6), jnp.zeros((), bool), jnp.zeros(6)), keys)
        return vs

    key = jax.random.PRNGKey(1)
    jax.block_until_ready(run_chain(params, goal, frame, depth, key))  # compile

    reps = 5
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run_chain(params, goal, frame, depth,
                                        jax.random.PRNGKey(r)))
        dt = time.perf_counter() - t0
        best = min(best, dt)

    hz = chain / best
    print(json.dumps({
        "metric": "servo_hz_vitb14_518",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
