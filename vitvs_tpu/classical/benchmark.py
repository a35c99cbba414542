"""Classical-path benchmark driver — the `ibvs_standard.py main()` analogue
(ibvs_standard.py:1229-1477): same pose sampling, NO rotation-compensation
search (the classical controller sets the pose directly,
ibvs_standard.py:1324), 5x divergence abort, same npz schema with
method={sift,orb,akaze} in the filename."""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from vitvs_tpu.classical.pipeline import classical_servo_step, extract_goal_features
from vitvs_tpu.harness import evals, results, samplers
from vitvs_tpu.harness.pipeline import ServoModel
from vitvs_tpu.harness.rollout import rollout_episode
from vitvs_tpu.io_bridge.config import VSConfig
from vitvs_tpu.sim import Scene, make_synthetic_poster, observe, perturb_texture


def run_classical_benchmark(
    cfg: VSConfig,
    scene: Scene | None = None,
    out_dir: str = ".",
    config_name: str = "config",
    method: str = "sift",
    perturbation: bool = False,
    chunk: int = 8,
    num_steps: int | None = None,
    max_corners: int = 512,
    seed: int = 41,
    perturb_seed: int = 489,
    save: bool = True,
    verbose: bool = True,
):
    t_start = time.time()
    cfg = cfg.replace(divergence_multiplier=5.0,       # ibvs_standard.py:215
                      early_divergence_abort=True)     # ibvs_standard.py:459-464
    model = ServoModel.create(cfg.replace(model_name="dinov2_vits14"),
                              compute_dtype=jnp.float32)
    model = ServoModel(vit=model.vit, cfg=cfg, compute_dtype=jnp.float32)
    scene = scene or Scene.create(make_synthetic_poster(512, seed=0))
    if method == "orb" and max_corners == 512:
        max_corners = 1000   # cv2.ORB_create(nfeatures=1000), ibvs_standard.py:341
    if method == "sift" and max_corners == 512:
        # cv2.SIFT has no feature cap; DoG top-K needs enough slots that the
        # two views' keypoint sets overlap (measured r2: top-24-by-distance
        # inlier rate 0.23 at K=384 -> 0.71 at K=1152 on the poster scene)
        max_corners = 1152

    positions, quats, n = samplers.generate_episode_starts(cfg, seed=seed)

    goal_pos = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    goal_quat = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)
    goal_rgb, _ = observe(scene, model.camera, goal_pos, goal_quat)
    goal_feats = extract_goal_features(model, goal_rgb, max_corners, method)

    textures = None
    if perturbation:
        keys = jax.random.split(jax.random.PRNGKey(perturb_seed), n)
        textures = jax.vmap(lambda k: perturb_texture(k, scene.texture))(keys)

    # NOTE goal features and the scene are threaded as jit ARGUMENTS (closure
    # captures are baked into the compile payload as constants)
    def run_one(gf, sc, sp, sq, k):
        def step_fn(rgb, depth, ema, prev_v, key):
            return classical_servo_step(model, gf, rgb, depth, ema, prev_v,
                                        key, max_corners, method=method)
        return rollout_episode(None, model, sc, None, sp, sq, k,
                               num_steps=num_steps, step_fn=step_fn)

    @jax.jit
    def run_batch(gf, sc, sps, sqs, ks):
        return jax.vmap(lambda sp, sq, k: run_one(gf, sc, sp, sq, k))(sps, sqs, ks)

    @jax.jit
    def run_batch_tx(gf, sc, txs, sps, sqs, ks):
        return jax.vmap(lambda tx, sp, sq, k: run_one(
            gf, sc._replace(texture=tx), sp, sq, k))(txs, sps, sqs, ks)

    episodes = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        pad = chunk - (hi - lo)

        def padded(a):
            a = np.asarray(a[lo:hi], np.float32)
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, 0)])
            return jnp.asarray(a)

        # keys from the absolute episode index: chunk-size invariant
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(lo, lo + chunk))
        if textures is None:
            batch = run_batch(goal_feats, scene, padded(positions),
                              padded(quats), keys)
        else:
            batch = run_batch_tx(goal_feats, scene, padded(textures),
                                 padded(positions), padded(quats), keys)
        batch = jax.tree.map(np.asarray, batch)
        for i in range(hi - lo):
            episodes.append(jax.tree.map(lambda a: a[i], batch))
        if verbose:
            done = sum(bool(e.converged) for e in episodes)
            print(f"[bench:{method}] episodes {hi}/{n}; converged: {done}")

    total_time = time.time() - t_start
    summaries = results.episode_summaries(episodes, positions, quats)
    path = None
    if save:
        path = results.save_results(out_dir, summaries, total_time,
                                    config_name=config_name, method=method,
                                    perturbed=perturbation)
    stats = evals.convergence_stats({**{k: np.asarray(v, dtype=object)
                                        if isinstance(v, list) else v
                                        for k, v in summaries.items()},
                                     "total_execution_time": total_time})
    return stats, path, summaries
