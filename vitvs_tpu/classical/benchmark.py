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
from vitvs_tpu.harness import chunks, evals, results, samplers
from vitvs_tpu.harness.pipeline import ServoModel
from vitvs_tpu.io_bridge.config import VSConfig
from vitvs_tpu.sim import Scene, load_poster_scene, observe


def run_classical_benchmark(
    cfg: VSConfig,
    scene: Scene | None = None,
    out_dir: str = ".",
    config_name: str = "config",
    method: str = "sift",
    perturbation: bool = False,
    chunk: int = 8,
    num_steps: int | None = None,
    max_corners: int | None = None,
    seed: int = 41,
    perturb_seed: int = 489,
    save: bool = True,
    verbose: bool = True,
    checkpoint_path: str | None = None,
):
    """`checkpoint_path` enables the same episode-level checkpoint/resume as
    the dino harness (harness/benchmark.py): completed episodes are pickled
    after every chunk and a re-run with the same path continues from the
    first missing chunk boundary.  The long binary pipelines (orb/akaze at
    ~50 ms/env-step) need this most — a 64-episode sweep is 1-3 h of wall."""
    t_start = time.time()
    cfg = cfg.replace(divergence_multiplier=5.0,       # ibvs_standard.py:215
                      early_divergence_abort=True)     # ibvs_standard.py:459-464
    model = ServoModel.create(cfg.replace(model_name="dinov2_vits14"),
                              compute_dtype=jnp.float32)
    model = ServoModel(vit=model.vit, cfg=cfg, compute_dtype=jnp.float32)
    scene = scene or load_poster_scene()   # the reference's real poster
    if max_corners is None:
        if method == "orb":
            max_corners = 1000  # cv2.ORB_create(nfeatures=1000), ibvs_standard.py:341
        elif method == "sift":
            # cv2.SIFT has no feature cap; DoG top-K needs enough slots that
            # the two views' keypoint sets overlap (measured r2:
            # top-24-by-distance inlier rate 0.23 at K=384 -> 0.71 at K=1152
            # on the poster scene)
            max_corners = 1152
        else:
            max_corners = 512

    positions, quats, n = samplers.generate_episode_starts(cfg, seed=seed)

    goal_pos = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    goal_quat = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)
    goal_rgb, _ = observe(scene, model.camera, goal_pos, goal_quat)
    goal_feats = extract_goal_features(model, goal_rgb, max_corners, method)

    # perturbed textures per chunk from absolute-index keys (chunk-invariant,
    # OOM-safe; harness/chunks.py)
    textures_for = None
    if perturbation:
        textures_for = chunks.make_textures_for(
            perturb_seed, n, scene.texture, np.arange(n))

    # NOTE goal features and the scene are threaded as jit ARGUMENTS (closure
    # captures are baked into the compile payload as constants).  Rollouts
    # run as host-chained SEGMENTS like harness/benchmark.py — one
    # uninterrupted 1500-step program crashed the TPU worker through the
    # tunnel (r2, sift at 640x480).
    from vitvs_tpu.harness.rollout import (
        episode_init, finalize_episode, rollout_segment)

    T = num_steps or cfg.max_iterations
    # 64-step segments: the akaze/orb steps are ~50 ms/env on device, so a
    # 250-step x 8-env segment is ~100 s of uninterrupted device time —
    # enough to trip the worker watchdog through the tunnel (measured r2:
    # 250-step akaze segments crash the worker, 50-step segments run fine;
    # sift at ~20 ms/env survives either way)
    seg = max(1, min(64, T))
    desired_p = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    desired_q = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)

    def make_step_fn(gf):
        def step_fn(rgb, depth, ema, prev_v, key):
            return classical_servo_step(model, gf, rgb, depth, ema, prev_v,
                                        key, max_corners, method=method)
        return step_fn

    @jax.jit
    def init_chunk(sps, sqs, ks):
        return jax.vmap(lambda sp, sq, k: episode_init(
            sp, sq, k, desired_p, desired_q))(sps, sqs, ks)

    _seg_cache: dict = {}

    def seg_fns(nsteps: int):
        if nsteps not in _seg_cache:
            @jax.jit
            def notx(gf, sc, carry):
                return jax.vmap(lambda c: rollout_segment(
                    None, model, sc, None, c, nsteps, desired_p, desired_q,
                    make_step_fn(gf)))(carry)

            @jax.jit
            def tx(gf, sc, txs, carry):
                return jax.vmap(lambda t, c: rollout_segment(
                    None, model, sc._replace(texture=t), None, c, nsteps,
                    desired_p, desired_q, make_step_fn(gf)))(txs, carry)

            _seg_cache[nsteps] = (notx, tx)
        return _seg_cache[nsteps]

    @jax.jit
    def finalize_chunk(carry, ys):
        return jax.vmap(lambda c, y: finalize_episode(
            c, y, desired_p, desired_q))(carry, ys)

    def run_chunk(txs, sps, sqs, ks):
        carry = init_chunk(sps, sqs, ks)
        ys_parts = []
        done = 0
        while done < T:
            nsteps = min(seg, T - done)
            fn_notx, fn_tx = seg_fns(nsteps)
            if txs is None:
                carry, ys = fn_notx(goal_feats, scene, carry)
            else:
                carry, ys = fn_tx(goal_feats, scene, txs, carry)
            ys_parts.append(ys)
            done += nsteps
            if done < T and bool(np.all(np.asarray(carry.conv.done
                                                   | carry.aborted))):
                # all-frozen fast-forward (harness/chunks.py)
                ys_parts.append(chunks.frozen_tail(ys, T - done))
                done = T
        full_ys = jax.tree.map(lambda *parts: jnp.concatenate(parts, axis=1),
                               *ys_parts)
        return finalize_chunk(carry, full_ys)

    # run-identity fingerprint (see harness/chunks.load_episodes): refuse to
    # resume a checkpoint written by a different method/config/flag set
    ckpt_meta = dict(
        kind="classical", method=method,
        n=int(n), seed=int(seed), perturbation=bool(perturbation),
        perturb_seed=int(perturb_seed), max_corners=int(max_corners),
        T=int(num_steps or cfg.max_iterations),
    )
    episodes, _ = chunks.load_episodes(checkpoint_path, f"bench:{method}",
                                       verbose, meta=ckpt_meta)

    for lo in range(len(episodes), n, chunk):
        hi = min(lo + chunk, n)
        pad = chunk - (hi - lo)

        def padded(a):
            return jnp.asarray(
                chunks.pad_tail(np.asarray(a[lo:hi], np.float32), pad))

        # keys from the absolute episode index: chunk-size invariant
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(lo, lo + chunk))
        txs = None if textures_for is None else textures_for(lo, hi, pad)
        batch = run_chunk(txs, padded(positions), padded(quats), keys)
        batch = jax.tree.map(np.asarray, batch)
        for i in range(hi - lo):
            episodes.append(jax.tree.map(lambda a: a[i], batch))
        chunks.save_episodes(checkpoint_path, episodes, meta=ckpt_meta)
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
