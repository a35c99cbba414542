"""The 500-episode benchmark driver — replaces the reference `main()`
(vitvs_v2.py:1345-1546) + its ROS/Gazebo orchestration (run_ibvs.sh).

Flow per the reference, but batched:
  1. sample start poses with the legacy seed-41 stream (identical poses);
  2. optionally pre-generate perturbed poster textures (one vmap — the
     reference pre-generates 500 Gazebo models and swaps them per episode);
  3. rotation-compensation search per episode (batched 4-view ViT forward);
  4. closed-loop rollouts, vmapped in chunks (sharded over a mesh when
     multiple devices are present);
  5. reference-format npz + summary stats.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from vitvs_tpu.control import EmaState
from vitvs_tpu.harness import chunks, evals, results, samplers
from vitvs_tpu.harness import viz as viz_mod
from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors
from vitvs_tpu.harness.pipeline import servo_step as servo_step_mod
from vitvs_tpu.harness.rollout import find_best_start_pose
from vitvs_tpu.io_bridge.config import VSConfig
from vitvs_tpu.models import vit as vit_mod
from vitvs_tpu.sim import Scene, load_poster_scene, make_synthetic_poster, observe


def build_model(cfg: VSConfig, params=None, compute_dtype=jnp.bfloat16,
                seed: int = 0):
    model = ServoModel.create(cfg, compute_dtype=compute_dtype)
    if params is None:
        if cfg.model_name.startswith("pixel"):
            from vitvs_tpu.models.baselines import init_pixel_params

            params = init_pixel_params(model.vit)
        else:
            params = vit_mod.init_vit(model.vit, jax.random.PRNGKey(seed))
    return params, model


def build_scene(texture: np.ndarray | None = None, half_size=None) -> Scene:
    """Default: the reference's REAL benchmark scene (viso poster texture on
    its 0.8 x 0.6 m mesh — the scene every published reference number is
    measured on, ibvs.launch:21-22).  Pass a texture for custom scenes or
    `make_synthetic_poster()` for the r1/r2 synthetic texture."""
    if texture is None:
        if half_size is not None:
            raise ValueError(
                "half_size requires a texture: the default poster scene has "
                "the reference mesh's fixed physical size (pass a texture to "
                "build a custom-size scene)")
        return load_poster_scene()
    return Scene.create(texture, half_size=0.42 if half_size is None else half_size)


def run_benchmark(
    cfg: VSConfig,
    params=None,
    model: ServoModel | None = None,
    scene: Scene | None = None,
    out_dir: str = ".",
    config_name: str = "config",
    perturbation: bool = False,
    rotation_search: bool = True,
    chunk: int = 8,
    num_steps: int | None = None,
    segment_steps: int | None = 250,
    seed: int = 41,                      # reference seed (vitvs_v2.py:1398)
    perturb_seed: int = 489,             # generate_perturbed_models.py:68
    save: bool = True,
    verbose: bool = True,
    checkpoint_path: str | None = None,
    mesh=None,
    quantized: bool = False,
    int8_static: bool = False,
    episode_indices=None,
    live_dir: str | None = None,
    live_every: int = 1,
):
    """`checkpoint_path` enables episode-level checkpoint/resume: after every
    chunk the completed episode results are pickled there, and a re-run with
    the same path continues from the first missing episode — the crash
    recovery the reference lacks entirely (SURVEY §5.3-5.4: a crashed
    500-episode sweep restarts from zero).

    `mesh` (a jax.sharding.Mesh with 'dp'/'tp' axes from parallel.make_mesh)
    shards each rollout chunk over data-parallel devices and the ViT params
    over tensor-parallel devices — replacing the reference's one-at-a-time
    episode loop (vitvs_v2.py:1434, SURVEY §2.3).  Episode PRNG keys derive
    from absolute indices, so rollouts are deterministic per episode; mesh
    results match the single-device run to float tolerance (~1e-4 over short
    rollouts — XLA schedules fusions differently under sharding, so bitwise
    equality is not achievable; asserted in tests/test_parallel.py).

    `live_dir` opens a live observability channel during the sweep — the
    offline equivalent of the reference's per-frame annotated-image ROS
    topics viewable in RViz (vitvs_v2.py:516-521,863-923): every
    `live_every` rollout segments, the first in-flight episode of the
    current chunk is snapshotted (current camera frame with matched current
    points in green / goal points in red, via harness.viz.draw_points) to
    `live_dir/ep{abs_idx:04d}_step{t:05d}.png`, with a `latest.png` symlink
    for tailing.

    `episode_indices` replays a subset of the benchmark's episodes by their
    ABSOLUTE index in the seed-41 stream: start poses, rotation-search keys,
    rollout keys and perturbation textures all derive from the absolute
    index, so a replayed episode is bit-identical to the same episode inside
    the full sweep — targeted failure-replay the reference harness cannot do
    (its 500-episode loop, vitvs_v2.py:1434, only runs front-to-back)."""
    t_start = time.time()
    if model is None:
        params, model = build_model(cfg, params)
    assert params is not None, "pass params when supplying a prebuilt model"
    scene = scene or build_scene()

    positions, quats, n = samplers.generate_episode_starts(cfg, seed=seed)
    n_total = n   # full seed-41 stream length (perturbation keys span it)
    abs_idx = np.arange(n)

    if quantized and not model.quantized:
        # the COMPLETE bench.py serving configuration, so the closed-loop
        # sweep convergence-validates exactly what the headline rate times:
        # int8 W8A8 projections, 'nomax3' deferred-normalize attention,
        # conv patch embed, single-pass bf16 preprocess resize (and, with
        # int8_static, calibrated static activation scales + fused
        # source-quantized binned descriptors)
        import dataclasses as _dc

        from vitvs_tpu.models.quant import quantize_vit_params

        model = _dc.replace(
            model, pp_precision="default",
            vit=_dc.replace(model.vit, quant_attn="nomax3",
                            patch_embed_impl="conv"))
        calib = None
        if int8_static:
            # static per-tensor activation scales (SmoothQuant fold,
            # models/quant.py) calibrated on REAL views of this scene: the
            # goal view + the first start poses of the FULL seed-41 stream
            # (so replays of a subset serve the exact full-sweep scales)
            from vitvs_tpu.harness.pipeline import preprocess as _pp

            k = min(7, n)
            vps = jnp.asarray(np.concatenate(
                [[samplers.DESIRED_POSITION], positions[:k]]), jnp.float32)
            vqs = jnp.asarray(np.concatenate(
                [[samplers.DESIRED_ORIENTATION], quats[:k]]), jnp.float32)
            # scene threaded as a jit ARGUMENT (closure-captured textures
            # embed in the remote-compile payload through the tunnel)
            imgs = jax.jit(jax.vmap(
                lambda sc, p, q: observe(sc, model.camera, p, q)[0],
                in_axes=(None, 0, 0)))(scene, vps, vqs)
            calib = jax.jit(jax.vmap(lambda f: _pp(model, f)))(imgs)
        params = quantize_vit_params(
            params, cfg=model.vit if calib is not None else None,
            calib_images=calib, layer=cfg.layer,
            compute_dtype=model.compute_dtype)
        model = _dc.replace(model, quantized=True)
    elif not model.quantized:
        # pre-cast f32 master weights to the compute dtype once: vit_features
        # casts the block stack per forward, and XLA does not reliably hoist
        # that conversion out of the rollout scan
        params = jax.tree.map(
            lambda a: a.astype(model.compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, params)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from vitvs_tpu.parallel import replicate as _replicate
        from vitvs_tpu.parallel import shard_vit_params as _shard_vit

        n_dp = mesh.shape["dp"]
        chunk = max(chunk, n_dp) // n_dp * n_dp   # chunk divisible by dp
        _dp_sharding = NamedSharding(mesh, _P("dp"))

        def env_put(x):
            return jax.device_put(x, _dp_sharding)

        params = (_shard_vit(params, mesh) if mesh.shape.get("tp", 1) > 1
                  else _replicate(params, mesh))
        scene = _replicate(scene, mesh)
        rep_put = lambda x: _replicate(x, mesh)  # noqa: E731
    else:
        env_put = rep_put = lambda x: x  # noqa: E731

    if episode_indices is not None:
        abs_idx = np.asarray(sorted(set(int(i) for i in episode_indices)))
        if abs_idx.size == 0 or abs_idx[0] < 0 or abs_idx[-1] >= n:
            raise ValueError(f"episode_indices must be within [0, {n})")
        positions = np.asarray(positions)[abs_idx]
        quats = np.asarray(quats)[abs_idx]
        n = len(abs_idx)

    def chunk_key_ids(lo: int, base: int = 0) -> jnp.ndarray:
        """PRNG key ids for the chunk starting at subset position `lo`,
        derived from ABSOLUTE episode indices (replay-invariant)."""
        ids = abs_idx[lo:min(lo + chunk, n)]
        if len(ids) < chunk:
            ids = np.concatenate([ids, np.repeat(ids[-1:], chunk - len(ids))])
        return jnp.asarray(base + ids)

    if verbose:
        ap, sp = samplers.pose_error_stats(positions, samplers.DESIRED_POSITION)
        ao, so = samplers.orientation_error_stats(quats, samplers.DESIRED_ORIENTATION)
        print(f"[bench] {n} episodes; initial pos err {ap:.2f}±{sp:.2f} cm, "
              f"rot err {ao:.2f}±{so:.2f} deg")

    # goal image: the scene rendered from the goal pose (the reference ships a
    # goalrgb.jpg photographed at exactly that pose, vitvs_v2.py:264)
    goal_pos = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    goal_quat = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)
    goal_rgb, _ = observe(scene, model.camera, goal_pos, goal_quat)
    goal_desc = rep_put(jax.jit(lambda p, f: goal_descriptors(p, model, f))(
        params, goal_rgb))

    # perturbed textures per episode (scene-level fault injection), generated
    # PER CHUNK from absolute-index keys (harness/chunks.py).  Deliberately
    # uncached here: the search phase completes before the rollout phase, so
    # each chunk IS generated twice — a few ms of augmentation ops per chunk
    # vs minutes of rollout; caching all chunks would re-create the OOM
    # make_textures_for documents
    textures_for = None
    if perturbation:
        textures_for = chunks.make_textures_for(
            perturb_seed, n_total, scene.texture, abs_idx, put=env_put)

    # run-identity fingerprint for checkpoint/resume: a resume file written
    # by a run with different episodes/config/flags must refuse to load, not
    # silently pair its results with this run's start poses
    # (config_name is results-neutral — it only names the npz — so it is
    # deliberately NOT part of the fingerprint: resuming under a different
    # output name is legitimate)
    ckpt_meta = dict(
        kind="dino", model=cfg.model_name,
        size=int(cfg.dino_input_size), layer=int(cfg.layer),
        abs_idx=tuple(int(i) for i in abs_idx), seed=int(seed),
        perturbation=bool(perturbation), perturb_seed=int(perturb_seed),
        rotation_search=bool(rotation_search),
        quantized=bool(model.quantized), int8_static=bool(int8_static),
        T=int(num_steps or cfg.max_iterations),
    )
    episodes, ckpt_extra = chunks.load_episodes(checkpoint_path, "bench",
                                                verbose, meta=ckpt_meta)

    # rotation-compensation search, vmapped across episode CHUNKS (one jit
    # call per chunk instead of one per episode — at ~30 ms tunnel RTT a
    # per-episode loop costs ~15 s of pure latency per 500-episode sweep).
    # NOTE params / goal_desc / scene arrays are threaded as jit ARGUMENTS —
    # closure captures would be baked into the compile payload as constants.
    best_quats = np.asarray(quats, np.float32)
    if rotation_search and "best_quats" in ckpt_extra:
        # the search is deterministic — restore it from the resume file
        # instead of re-running the 4-view render+forward for every episode
        best_quats = np.asarray(ckpt_extra["best_quats"], np.float32)
    elif rotation_search:
        @jax.jit
        def search_chunk_notx(params, goal_desc, scene, poss, qs, keys):
            return jax.vmap(lambda pos, q, k: find_best_start_pose(
                params, model, scene, goal_desc, pos, q, k)[1])(poss, qs, keys)

        @jax.jit
        def search_chunk_tx(params, goal_desc, scene, txs, poss, qs, keys):
            return jax.vmap(lambda tx, pos, q, k: find_best_start_pose(
                params, model, scene._replace(texture=tx), goal_desc, pos, q, k
            )[1])(txs, poss, qs, keys)

        bq = []
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            pad = chunk - (hi - lo)

            def pad_to_chunk(a):
                a = np.asarray(a[lo:hi], np.float32)
                if pad:
                    a = np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                return env_put(jnp.asarray(a))

            keys = env_put(jax.vmap(jax.random.PRNGKey)(chunk_key_ids(lo, 1000)))
            if textures_for is None:
                out = search_chunk_notx(params, goal_desc, scene,
                                        pad_to_chunk(positions),
                                        pad_to_chunk(best_quats), keys)
            else:
                out = search_chunk_tx(params, goal_desc, scene,
                                      textures_for(lo, hi, pad),
                                      pad_to_chunk(positions),
                                      pad_to_chunk(best_quats), keys)
            bq.append(np.asarray(out)[: hi - lo])
        best_quats = np.concatenate(bq)
        # persist the search results immediately: a crash-resume then skips
        # the whole search phase instead of recomputing it for all episodes
        chunks.save_episodes(checkpoint_path, episodes, meta=ckpt_meta,
                             extra={"best_quats": best_quats})

    # vmapped rollouts in chunks, executed as host-chained SEGMENTS so no
    # single device program runs unboundedly long (long uninterrupted
    # programs can trip runtime watchdogs; segments also enable mid-episode
    # checkpointing)
    from vitvs_tpu.harness.rollout import (
        episode_init, finalize_episode, rollout_segment)

    T = num_steps or cfg.max_iterations
    seg = max(1, min(segment_steps or T, T))
    desired_p = jnp.asarray(samplers.DESIRED_POSITION, jnp.float32)
    desired_q = jnp.asarray(samplers.DESIRED_ORIENTATION, jnp.float32)

    @jax.jit
    def init_chunk(starts, sqs, keys):
        return jax.vmap(lambda sp, sq, k: episode_init(sp, sq, k, desired_p, desired_q)
                        )(starts, sqs, keys)

    # segment functions cached per length: the LAST segment is clamped to the
    # remainder so exactly T steps execute and the concatenated histories are
    # (T, ...) for any segment_steps (at most one extra compile when seg ∤ T)
    _seg_cache: dict = {}

    def seg_fns(nsteps: int):
        if nsteps not in _seg_cache:
            @jax.jit
            def notx(params, goal_desc, scene, carry):
                return jax.vmap(lambda c: rollout_segment(
                    params, model, scene, goal_desc, c, nsteps,
                    desired_p, desired_q))(carry)

            @jax.jit
            def tx(params, goal_desc, scene, sc_textures, carry):
                return jax.vmap(lambda t, c: rollout_segment(
                    params, model, scene._replace(texture=t), goal_desc, c,
                    nsteps, desired_p, desired_q))(sc_textures, carry)

            _seg_cache[nsteps] = (notx, tx)
        return _seg_cache[nsteps]

    @jax.jit
    def finalize_chunk(carry, ys):
        return jax.vmap(lambda c, y: finalize_episode(c, y, desired_p, desired_q)
                        )(carry, ys)

    _live = {"fn": None, "segs": 0}

    def live_snapshot(carry, tx, abs_ep: int, step_done: int) -> None:
        """Annotated-frame live channel (see `live_dir` in the docstring).
        One extra servo forward per snapshot — negligible against a
        segment's `seg` vmapped steps."""
        if _live["fn"] is None:
            @jax.jit
            def _fn(params, goal_desc, sc, position, quat, ema_v, ema_i,
                    prev_v, key):
                rgb, depth = observe(sc, model.camera, position, quat)
                res = servo_step_mod(params, model, goal_desc, rgb, depth,
                                     EmaState(ema_v, ema_i), prev_v, key)
                return rgb, res.s_uv, res.s_uv_star, res.valid

            _live["fn"] = _fn
        sc = scene if tx is None else scene._replace(
            texture=jax.tree.map(lambda a: a[0], tx))
        c0 = jax.tree.map(lambda a: a[0], carry)
        rgb, s_uv, s_uv_star, valid = _live["fn"](
            params, goal_desc, sc, c0.position, c0.quat,
            c0.ema.value, c0.ema.initialized, c0.prev_v_c, c0.key)
        valid = np.asarray(valid)
        img = viz_mod.draw_points(np.clip(np.asarray(rgb, np.float32), 0, 1),
                                  np.asarray(s_uv)[valid],
                                  np.asarray(s_uv_star)[valid])
        os.makedirs(live_dir, exist_ok=True)
        name = f"ep{abs_ep:04d}_step{step_done:05d}.png"
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import image as mpimg

        mpimg.imsave(os.path.join(live_dir, name), img)
        tmp = os.path.join(live_dir, ".latest.tmp")
        if os.path.lexists(tmp):
            os.unlink(tmp)
        os.symlink(name, tmp)
        os.replace(tmp, os.path.join(live_dir, "latest.png"))

    def run_chunk(tx, starts, sqs, keys, abs_ep0: int = -1):
        carry = init_chunk(starts, sqs, keys)
        ys_parts = []
        done = 0
        while done < T:
            nsteps = min(seg, T - done)
            fn_notx, fn_tx = seg_fns(nsteps)
            if tx is None:
                carry, ys = fn_notx(params, goal_desc, scene, carry)
            else:
                carry, ys = fn_tx(params, goal_desc, scene, tx, carry)
            ys_parts.append(ys)
            done += nsteps
            if live_dir is not None and abs_ep0 >= 0:
                _live["segs"] += 1
                if _live["segs"] % max(live_every, 1) == 0:
                    live_snapshot(carry, tx, abs_ep0, done)
            if done < T and bool(np.all(np.asarray(carry.conv.done
                                                   | carry.aborted))):
                # exact fast-forward: once every episode in the chunk is
                # frozen (converged/stopped/aborted), rollout_segment would
                # only re-record the frozen pose with zero commands for the
                # remaining steps (rollout.py freezes the whole carry, incl.
                # the PRNG key) — synthesize those histories host-side
                # instead of running the device.  Bit-identical results;
                # typically skips most of a converged sweep's device work.
                ys_parts.append(chunks.frozen_tail(ys, T - done))
                done = T
        full_ys = jax.tree.map(lambda *parts: jnp.concatenate(parts, axis=1),
                               *ys_parts)
        return finalize_chunk(carry, full_ys)

    # episodes are appended whole chunks at a time, so resuming at
    # len(episodes) always lands on a chunk boundary (or past the end)
    for lo in range(len(episodes), n, chunk):
        hi = min(lo + chunk, n)
        pad = chunk - (hi - lo)
        sl = slice(lo, hi)

        def padded(a):
            return env_put(jnp.asarray(
                chunks.pad_tail(np.asarray(a[sl], np.float32), pad)))

        # keys derive from the ABSOLUTE episode index so results are invariant
        # to --chunk, to resuming with a different chunk size, and to the mesh
        keys = env_put(jax.vmap(jax.random.PRNGKey)(chunk_key_ids(lo)))
        tx = None if textures_for is None else textures_for(lo, hi, pad)
        batch = run_chunk(tx, padded(positions), padded(best_quats), keys,
                          abs_ep0=int(abs_idx[lo]))
        batch = jax.tree.map(np.asarray, batch)
        for i in range(hi - lo):
            episodes.append(jax.tree.map(lambda a: a[i], batch))
        chunks.save_episodes(checkpoint_path, episodes, meta=ckpt_meta,
                             extra={"best_quats": best_quats})
        if verbose:
            done = sum(bool(e.converged) for e in episodes)
            print(f"[bench] episodes {hi}/{n}; converged so far: {done}")

    total_time = time.time() - t_start
    best_poses = [(positions[i], best_quats[i]) for i in range(n)]
    summaries = results.episode_summaries(episodes, positions, quats, best_poses)
    path = None
    if save:
        path = results.save_results(out_dir, summaries, total_time,
                                    config_name=config_name,
                                    # the reference's rotation-off ablation
                                    # writes ..._dino_no_rot_... npz
                                    # (vitvs_v2_rotation_off.py)
                                    method=("dino" if rotation_search
                                            else "dino_no_rot"),
                                    perturbed=perturbation)
    stats = evals.convergence_stats({**{k: np.asarray(v, dtype=object)
                                        if isinstance(v, list) else v
                                        for k, v in summaries.items()},
                                     "total_execution_time": total_time})
    if verbose:
        print(f"[bench] convergence {stats.convergence_rate:.1f}% "
              f"({stats.num_converged}/{stats.num_samples}) in {total_time:.1f}s")
    return stats, path, summaries
