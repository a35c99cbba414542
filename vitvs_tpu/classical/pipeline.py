"""Classical per-frame servo pipeline (the ibvs_standard controller).

Mirrors the reference classical controller's `detect_features` + `ibvs`
(`ibvs_standard.py:320-519`): full-resolution grayscale frames, corner
detection on BOTH goal and current frames each iteration, mutual-NN
matching, same IBVS control law.  Differences from the ViT path carried over
from the reference:

* on feature failure the previous velocity is REUSED (ibvs_standard.py:469-477)
  — the same semantics our StepResult/feature_ok protocol already encodes;
* the divergence abort threshold is 5x (configured via
  VSConfig.divergence_multiplier by the CLI).

Goal-frame corners/descriptors are precomputed per episode (the goal image
is constant; the reference recomputes them every frame).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vitvs_tpu.control import (
    EmaState,
    body_twist_from_optical,
    depth_at_points,
    ema_update,
    ibvs_velocity,
)
from vitvs_tpu.classical.features import (
    detect_corners,
    grayscale,
    match_descriptors,
    sift_like_descriptors,
)
from vitvs_tpu.harness.pipeline import ServoModel, StepResult


class GoalFeatures(NamedTuple):
    uv: jnp.ndarray      # (K, 2)
    desc: jnp.ndarray    # (K, D)
    valid: jnp.ndarray   # (K,)


# method -> BFMatcher norm, mirroring the reference dispatch
# (ibvs_standard.py:336-347): SIFT NORM_L2; ORB/AKAZE NORM_HAMMING.
METHOD_NORMS = {"sift": "l2", "orb": "hamming", "akaze": "hamming",
                "harris": "l2"}

# Lowe ambiguity-ratio per method (see match_descriptors): tuned r3 so the
# top-24 selection reaches the ~98% inlier operating point the reference
# gets from cv2's detectors — the IBVS retreat transient is only stable
# there.  0.7 is Lowe's classic SIFT value; binary descriptors separate
# less, so ORB/AKAZE use the customary 0.8.
METHOD_RATIOS = {"sift": 0.7, "orb": 0.8, "akaze": 0.8, "harris": 0.7}


def extract_features(model: ServoModel, gray: jnp.ndarray,
                     max_corners: int = 512,
                     method: str = "sift") -> GoalFeatures:
    """detectAndCompute for one grayscale frame, per-method
    (ibvs_standard.py:336-350):

    'sift'   — DoG scale-space keypoints + 128-d gradient descriptors;
    'orb'    — Harris pyramid corners + steered BRIEF (256-bit binary);
    'akaze'  — nonlinear scale space + M-LDB (486-bit binary);
    'harris' — round-1 single-scale Harris + SIFT-like (kept as the
               cheapest variant).
    """
    if method == "sift":
        from vitvs_tpu.classical.scalespace import sift_features

        f = sift_features(gray, max_corners)
        return GoalFeatures(uv=f.uv, desc=f.desc, valid=f.valid)
    if method == "orb":
        from vitvs_tpu.classical.binary import orb_features

        f = orb_features(gray, nfeatures=max_corners)
        return GoalFeatures(uv=f.uv, desc=f.desc, valid=f.valid)
    if method == "akaze":
        from vitvs_tpu.classical.binary import akaze_features

        f = akaze_features(gray, max_keypoints=max_corners)
        return GoalFeatures(uv=f.uv, desc=f.desc, valid=f.valid)
    if method == "harris":
        c = detect_corners(gray, max_corners)
        d = sift_like_descriptors(gray, c.uv)
        return GoalFeatures(uv=c.uv, desc=d, valid=c.valid)
    raise ValueError(f"unknown classical method {method!r}")


def extract_goal_features(model: ServoModel, goal_rgb: jnp.ndarray,
                          max_corners: int = 512,
                          method: str = "sift") -> GoalFeatures:
    g = grayscale(jnp.asarray(goal_rgb, jnp.float32))
    return extract_features(model, g, max_corners, method)


def classical_servo_step(
    model: ServoModel,
    goal_feats: GoalFeatures,
    frame_rgb: jnp.ndarray,
    frame_depth_m: jnp.ndarray,
    ema: EmaState,
    prev_v_c: jnp.ndarray,
    key: jax.Array,
    max_corners: int = 512,
    method: str = "sift",
) -> StepResult:
    cfg = model.cfg
    cam = model.camera
    del key  # classical matching is deterministic (top-by-distance)

    g = grayscale(jnp.asarray(frame_rgb, jnp.float32))
    feats = extract_features(model, g, max_corners, method)

    m = match_descriptors(goal_feats.desc, feats.desc, goal_feats.valid,
                          feats.valid, cfg.num_pairs,
                          norm=METHOD_NORMS[method],
                          ratio=METHOD_RATIOS[method])

    s_uv_star = goal_feats.uv[m.idx1]          # goal points (kp1, queryIdx)
    s_uv = feats.uv[m.idx2]                    # current points (kp2, trainIdx)
    s_uv_star = jnp.round(s_uv_star)
    s_uv = jnp.round(s_uv)

    feature_ok = m.num_valid >= 4

    s_xy = cam.pixel_to_normalized(s_uv)
    s_star_xy = cam.pixel_to_normalized(s_uv_star)
    Z = depth_at_points(frame_depth_m, s_uv)

    v_raw = ibvs_velocity(s_xy, s_star_xy, Z, cfg.lambda_, valid=m.valid,
                          mode=cfg.pinv_mode, damping=cfg.pinv_damping)

    ema_new, v_smoothed = ema_update(ema, v_raw, cfg.ema_alpha)
    v_c = jnp.where(feature_ok, v_smoothed, prev_v_c)
    ema_out = EmaState(
        value=jnp.where(feature_ok, ema_new.value, ema.value),
        initialized=jnp.where(feature_ok, ema_new.initialized, ema.initialized),
    )
    body = body_twist_from_optical(v_c, cfg.max_velocity)

    # "similarity" for diagnostics: inverse of normalized match distance
    sim = jnp.where(m.valid, 1.0 / (1.0 + m.distance), 0.0)
    mean_sim = jnp.sum(sim) / jnp.maximum(m.num_valid, 1)

    return StepResult(
        v_c=v_c,
        body_twist=body,
        ema=ema_out,
        feature_ok=feature_ok,
        num_valid=m.num_valid,
        mean_sim=jnp.where(m.num_valid > 0, mean_sim, -jnp.inf),
        s_uv=s_uv,
        s_uv_star=s_uv_star,
        valid=m.valid,
    )
