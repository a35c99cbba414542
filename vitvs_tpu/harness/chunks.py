"""Shared chunk/checkpoint machinery for the two benchmark drivers.

The dino driver (harness/benchmark.py) and the classical driver
(classical/benchmark.py) run the same outer loop: pad episode chunks to a
fixed vmap width, derive per-chunk perturbation textures from absolute
episode indices, pickle completed episodes after every chunk (the crash
recovery the reference lacks, SURVEY §5.3-5.4), and synthesize frozen
histories host-side once every episode in a chunk is done.  One copy here
so a fix to any of it cannot silently miss the other driver."""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from vitvs_tpu.sim import perturb_texture


def pad_tail(a: np.ndarray, pad: int) -> np.ndarray:
    """Pad a chunk to the vmap width by repeating its last row."""
    if pad:
        a = np.concatenate([a, np.repeat(a[-1:], pad, 0)])
    return a


def make_textures_for(perturb_seed: int, n_total: int, texture, abs_idx,
                      put=None):
    """Per-chunk perturbed-texture factory.

    Keys derive from the ABSOLUTE episode index (chunk-, resume-, replay- and
    mesh-invariant).  Textures are deliberately generated per chunk, not
    cached: materializing all n up front OOMs on real-size scenes (500 x the
    1500x1125 viso poster ~ 10 GB of HBM; r3 OOM'd at 21.8/15.75 GB), and a
    chunk costs a few ms of augmentation vs minutes of rollout."""
    tex_keys = np.asarray(
        jax.random.split(jax.random.PRNGKey(perturb_seed), n_total))
    _perturb_chunk = jax.jit(jax.vmap(perturb_texture, in_axes=(0, None)))
    put = put or (lambda x: x)

    def textures_for(lo: int, hi: int, pad: int):
        ks = pad_tail(tex_keys[abs_idx[lo:hi]], pad)
        return put(_perturb_chunk(jnp.asarray(ks), texture))

    return textures_for


def load_episodes(checkpoint_path: str | None, tag: str = "bench",
                  verbose: bool = True, meta: dict | None = None,
                  ) -> tuple[list, dict]:
    """Resume the completed-episode list (whole chunks, so the driver's
    `range(len(episodes), n, chunk)` always lands on a chunk boundary).

    `meta` is the caller's run-identity fingerprint (episode indices,
    config name, flags...).  A checkpoint written by a run with a DIFFERENT
    fingerprint refuses to resume instead of silently pairing another run's
    results with this run's start poses.  Pre-fingerprint checkpoints (bare
    pickled lists) resume with a warning.

    Returns (episodes, extra) — `extra` carries driver-specific resumable
    state (e.g. the dino driver's rotation-search results)."""
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path, "rb") as fh:
            payload = pickle.load(fh)
        if isinstance(payload, list):   # pre-fingerprint format
            episodes, saved_meta, extra = payload, None, {}
            if meta is not None and verbose:
                print(f"[{tag}] WARNING: {checkpoint_path} predates run "
                      "fingerprinting — cannot verify it belongs to this run")
        else:
            episodes = payload["episodes"]
            saved_meta = payload.get("meta")
            extra = payload.get("extra") or {}
        if meta is not None and saved_meta is not None and saved_meta != meta:
            diff = sorted(k for k in set(saved_meta) | set(meta)
                          if saved_meta.get(k) != meta.get(k))
            raise ValueError(
                f"[{tag}] resume checkpoint {checkpoint_path} was written by "
                f"a different run (mismatched: {diff}); delete it or pass a "
                "different --resume path")
        if verbose:
            print(f"[{tag}] resumed {len(episodes)} episodes "
                  f"from {checkpoint_path}")
        return episodes, extra
    return [], {}


def save_episodes(checkpoint_path: str | None, episodes: list,
                  meta: dict | None = None,
                  extra: dict | None = None) -> None:
    """Atomic (tmp + rename) episode-checkpoint write after each chunk,
    fingerprinted with the run identity (see load_episodes)."""
    if not checkpoint_path:
        return
    tmp = checkpoint_path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump({"meta": meta, "episodes": episodes,
                     "extra": extra or {}}, fh)
    os.replace(tmp, checkpoint_path)


def frozen_tail(ys, rest: int) -> dict:
    """Exact fast-forward histories once every episode in a chunk is frozen
    (converged/stopped/aborted): rollout_segment would only re-record the
    frozen pose with zero commands for the remaining steps, so synthesize
    those host-side instead of running the device.  Bit-identical results."""
    last = jax.tree.map(lambda a: np.asarray(a)[:, -1], ys)

    def tile(a):
        return jnp.asarray(np.broadcast_to(
            a[:, None], (a.shape[0], rest) + a.shape[1:]))

    nchunk = last["position"].shape[0]
    return {
        "position": tile(last["position"]),
        "quat": tile(last["quat"]),
        "v_c": jnp.zeros((nchunk, rest, 6), jnp.float32),
        "twist": jnp.zeros((nchunk, rest, 6), jnp.float32),
        "err": tile(last["err"]),
        "active": jnp.zeros((nchunk, rest), bool),
    }
