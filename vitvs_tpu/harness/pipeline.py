"""The per-frame servo pipeline: ONE jitted graph from camera frame to
velocity command.

This collapses the reference's L3+L4 hot loop (`Controller.ibvs` ->
`detect_features` -> `find_correspondences_batch` -> `get_depth` ->
`calculate_interaction_matrix` -> pinv -> EMA, SURVEY §3.2) into a single
pure function.  Every ROS/process boundary the reference crosses per frame
becomes in-graph dataflow; host I/O exists only at the graph edge
(io_bridge).

Reference behavior notes:
* Goal descriptors are a loop invariant (the goal image is a fixed file,
  vitvs_v2.py:264) — the reference recomputes them EVERY frame with a second
  full ViT forward (vitvs_v2.py:482-487); here they are computed once per
  episode, halving ViT compute with bit-identical results.
* When fewer than `num_pairs` matches survive, the reference zero-pads the
  pixel arrays and feeds phantom (0,0) points into the control law
  (`calculate_uv`, vitvs_v2.py:533-553).  The default here masks invalid
  pairs out of the least-squares solve; set
  ``VSConfig.reference_pad_bug=True`` for bug-compatible behavior.
* Fewer than 4 valid matches => feature failure: the previous velocity
  command is retained and the EMA/history are not updated, matching the
  early return in `ibvs` (vitvs_v2.py:597-605) + reuse of `self.v_c`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vitvs_tpu.core import image as image_ops
from vitvs_tpu.core.camera import CameraIntrinsics
from vitvs_tpu.control import (
    EmaState,
    body_twist_from_optical,
    depth_at_points,
    ema_update,
    ibvs_velocity,
)
from vitvs_tpu.io_bridge.config import VSConfig
from vitvs_tpu.match import (find_correspondences, match_points_to_pixels,
                             refine_matches_subpixel)
from vitvs_tpu.models.extractor import extract_descriptors
from vitvs_tpu.models.vit import ViTConfig, ViTParams, make_config


@dataclasses.dataclass(frozen=True)
class ServoModel:
    """Static bundle: ViT architecture + servo config + camera intrinsics.

    Frozen/hashable => usable as a jit-static argument; the params pytree
    travels separately.
    """

    vit: ViTConfig
    cfg: VSConfig
    compute_dtype: Any = jnp.bfloat16
    precision: Any = None
    # route the match argmax through the fused Pallas kernel (ops/matcher.py);
    # automatically falls back to XLA off-TPU
    use_match_kernel: bool = False
    # int8 W8A8 serving path (params must come from quantize_vit_params)
    quantized: bool = False
    # factorized binned matching (match/binned.py): the binned similarity is
    # computed from UNBINNED descriptors via the shift identity — 9x fewer
    # matmul FLOPs, no 9d descriptor tensors (exact up to float assoc).
    # Default OFF: on v5e the int8 MXU eats the brute-force 9d matmul faster
    # than the shift-sum's slice traffic (405 vs 376 Hz measured); the
    # factorized path wins where matmul FLOPs are the constraint (larger
    # grids / f32 matching).
    fast_binned_match: bool = False
    # matmul precision of the preprocess resize (core/image.resize):
    # 'highest' = f32-exact parity default; 'high' ~f32 at 2x; 'default' =
    # single-pass bf16, error below 8-bit sensor quantization (serving)
    pp_precision: str = "highest"
    # int8 serving only: quantize the binned descriptors AT THE SOURCE
    # (match/binned.quantize_binned_int8) — the (t, 9D) bf16 binned tensor
    # never materializes; quantized values are identical to quantizing the
    # materialized descriptors, so this only removes HBM traffic.  The goal /
    # current descriptors then travel as QuantizedBinned pytrees.
    fused_bin_quant: bool = True

    @property
    def source_quantized_bins(self) -> bool:
        return (self.quantized and self.materialize_bins
                and self.fused_bin_quant and not self.use_match_kernel)

    @staticmethod
    def create(cfg: VSConfig, compute_dtype=None, precision=None,
               gelu_approx: bool = True) -> "ServoModel":
        """gelu_approx=True is the production default (tanh GELU, ~15% faster
        on the VPU, descriptor error ~1e-3 relative); pass False for strict
        torch-parity numerics.  compute_dtype defaults to cfg.compute_dtype
        (bfloat16)."""
        import dataclasses as _dc

        if compute_dtype is None:
            compute_dtype = jnp.dtype(cfg.compute_dtype).type
        vit = _dc.replace(make_config(cfg.model_name, cfg.stride),
                          gelu_approx=gelu_approx,
                          attn_score=cfg.attn_score, kv_pool=cfg.kv_pool,
                          kv_pool_impl=cfg.kv_pool_impl,
                          kv_pool_where=cfg.kv_pool_where)
        return ServoModel(
            vit=vit,
            cfg=cfg,
            compute_dtype=compute_dtype,
            precision=precision,
        )

    @property
    def binned(self) -> bool:
        return self.cfg.use_feature_binning

    @property
    def materialize_bins(self) -> bool:
        # True when descriptors themselves must be binned (slow path)
        return self.binned and not self.fast_binned_match

    def desc_dim(self) -> int:
        return self.vit.embed_dim * (9 if self.materialize_bins else 1)

    @property
    def camera(self) -> CameraIntrinsics:
        c = self.cfg
        return CameraIntrinsics(width=c.u_max, height=c.v_max, fx=c.f_x, fy=c.f_y)

    @property
    def mean(self):
        return image_ops.IMAGENET_MEAN if "dino" in self.cfg.model_name else image_ops.HALF_MEAN

    @property
    def std(self):
        return image_ops.IMAGENET_STD if "dino" in self.cfg.model_name else image_ops.HALF_STD

    def grid(self) -> tuple[int, int]:
        return self.vit.num_patches(self.cfg.dino_input_size, self.cfg.dino_input_size)


class StepResult(NamedTuple):
    v_c: jnp.ndarray          # (6,) smoothed optical-frame velocity
    body_twist: jnp.ndarray   # (6,) clipped body-frame command
    ema: EmaState
    feature_ok: jnp.ndarray   # () bool — >= 4 valid correspondences
    num_valid: jnp.ndarray    # () int32
    mean_sim: jnp.ndarray     # () mean similarity of selected matches
    s_uv: jnp.ndarray         # (k, 2) current-image pixel features
    s_uv_star: jnp.ndarray    # (k, 2) goal-image pixel features
    valid: jnp.ndarray        # (k,) bool


def preprocess(model: ServoModel, rgb: jnp.ndarray) -> jnp.ndarray:
    """Camera frame -> normalized ViT input (reference vitvs_v2.py:474-480)."""
    return image_ops.preprocess_frame(
        rgb, model.cfg.dino_input_size, model.mean, model.std,
        method="bicubic", antialias=True, precision=model.pp_precision,
    )


def goal_descriptors(params: ViTParams, model: ServoModel, goal_rgb: jnp.ndarray):
    """Per-episode goal descriptor precompute -> (t, d), or a QuantizedBinned
    pytree on the source-quantized int8 serving path."""
    x = preprocess(model, goal_rgb)[None]
    src_q = model.source_quantized_bins
    desc = extract_descriptors(
        params, model.vit, x, layer=model.cfg.layer, facet=model.cfg.facet,
        bin=model.materialize_bins and not src_q,
        compute_dtype=model.compute_dtype, precision=model.precision,
        quantized=model.quantized,
    )[0, 0]
    if src_q:
        from vitvs_tpu.match.binned import quantize_binned_int8

        return quantize_binned_int8(desc, model.grid())
    return desc


def servo_step(
    params: ViTParams,
    model: ServoModel,
    goal_desc: jnp.ndarray,
    frame_rgb: jnp.ndarray,
    frame_depth_m: jnp.ndarray,
    ema: EmaState,
    prev_v_c: jnp.ndarray,
    key: jax.Array,
    num_pairs: int | None = None,
) -> StepResult:
    """One complete servo iteration (the hot loop body, SURVEY §3.2).

    frame_rgb: (H, W, 3) uint8 or float [0,1] camera frame.
    frame_depth_m: (H, W) z-depth in meters (0 = no return).
    Returns the smoothed optical velocity, the clipped body twist, and
    match diagnostics.
    """
    cfg = model.cfg
    k = num_pairs or cfg.num_pairs

    x = preprocess(model, frame_rgb)[None]
    src_q = model.source_quantized_bins
    cur_desc = extract_descriptors(
        params, model.vit, x, layer=cfg.layer, facet=cfg.facet,
        bin=model.materialize_bins and not src_q,
        compute_dtype=model.compute_dtype, precision=model.precision,
        quantized=model.quantized,
    )[0, 0]

    grid = model.grid()
    if src_q:
        from vitvs_tpu.match.binned import quantize_binned_int8

        cur_desc = quantize_binned_int8(cur_desc, grid)
    sim_matrix = None
    if model.binned and model.fast_binned_match:
        from vitvs_tpu.match.binned import binned_cosine_similarity

        sim_matrix = binned_cosine_similarity(goal_desc, cur_desc, grid,
                                              precision=model.precision,
                                              int8=model.quantized)
    match = find_correspondences(
        goal_desc, cur_desc, grid, k, key,
        # config key the reference loads (vitvs_v2.py:293) but never passes —
        # find_correspondences_batch always gets the default 1.0; threading it
        # here makes the knob live (default identical)
        distance_threshold=cfg.thresh_filter_keypoints,
        precision=model.precision, use_kernel=model.use_match_kernel,
        int8=model.quantized,  # int8 serving quantizes the match matmul too
        sim_matrix=sim_matrix,
    )
    if cfg.subpixel_matching:
        # sub-patch parabola refinement of the current image's positions —
        # removes the patch-pitch quantization floor (see VSConfig field
        # doc).  The fast-binned path refines on the SAME materialized
        # similarity the match was made on (sim_matrix), so the parabola
        # center is a true neighborhood max on that landscape.
        match = refine_matches_subpixel(goal_desc, cur_desc, match, grid,
                                        sim_matrix=sim_matrix)

    # patch -> camera pixels (goal points = image1, current = image2)
    round_px = not cfg.subpixel_matching
    s_uv_star = match_points_to_pixels(match.points1, grid[0], cfg.dino_input_size,
                                       (cfg.u_max, cfg.v_max), round_px=round_px)
    s_uv = match_points_to_pixels(match.points2, grid[0], cfg.dino_input_size,
                                  (cfg.u_max, cfg.v_max), round_px=round_px)

    feature_ok = match.num_valid >= 4
    cam = model.camera

    if getattr(cfg, "reference_pad_bug", False):
        # bug-compatible: phantom (0,0) pixels for invalid slots
        pad = jnp.zeros_like(s_uv)
        s_uv_eff = jnp.where(match.valid[:, None], s_uv, pad)
        s_uv_star_eff = jnp.where(match.valid[:, None], s_uv_star, pad)
        valid_for_solve = None
    else:
        s_uv_eff, s_uv_star_eff = s_uv, s_uv_star
        valid_for_solve = match.valid

    s_xy = cam.pixel_to_normalized(s_uv_eff)
    s_star_xy = cam.pixel_to_normalized(s_uv_star_eff)
    Z = depth_at_points(frame_depth_m, s_uv_eff)

    v_raw = ibvs_velocity(
        s_xy, s_star_xy, Z, cfg.lambda_, valid=valid_for_solve,
        mode=cfg.pinv_mode, damping=cfg.pinv_damping,
    )

    # feature failure => keep previous command, frozen EMA (vitvs_v2.py:597-605)
    ema_new, v_smoothed = ema_update(ema, v_raw, cfg.ema_alpha)
    v_c = jnp.where(feature_ok, v_smoothed, prev_v_c)
    ema_out = EmaState(
        value=jnp.where(feature_ok, ema_new.value, ema.value),
        initialized=jnp.where(feature_ok, ema_new.initialized, ema.initialized),
    )

    body = body_twist_from_optical(v_c, cfg.max_velocity)

    sim_sum = jnp.sum(jnp.where(match.valid, match.sim, 0.0))
    mean_sim = sim_sum / jnp.maximum(match.num_valid, 1)

    return StepResult(
        v_c=v_c,
        body_twist=body,
        ema=ema_out,
        feature_ok=feature_ok,
        num_valid=match.num_valid,
        mean_sim=jnp.where(match.num_valid > 0, mean_sim, -jnp.inf),
        s_uv=s_uv,
        s_uv_star=s_uv_star,
        valid=match.valid,
    )
