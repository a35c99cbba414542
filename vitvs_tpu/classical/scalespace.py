"""DoG scale-space keypoints with subpixel refinement (the SIFT detector).

The reference classical controller calls `cv2.SIFT_create().detectAndCompute`
(ibvs_standard.py:336-350): a difference-of-Gaussians octave pyramid, 3x3x3
extrema, quadratic subpixel interpolation, edge rejection, and 128-d gradient
histogram descriptors.  Round-1's single-scale Harris pipeline could not
track the benchmark's scale changes (start heights span 0.46-0.76 m against
a 0.61 m goal -> ~1.3x scale swings) and converged 0/8 on hardware; this
module adds the scale dimension as fixed-shape XLA ops:

* per-octave Gaussian stacks built by incremental separable blurs;
* DoG extrema as reduce_window max/min over (level, y, x) neighborhoods —
  no data-dependent keypoint lists, a static top-K per octave with masks;
* quadratic subpixel offsets from the 2x2 spatial Hessian (closed form);
* SIFT edge rejection (Hessian trace^2/det ratio, Lowe's r = 10);
* descriptors sampled from the octave's own Gaussian level with the
  keypoint's scale multiplying the sampling window.

Everything is differentiable-free inference code; shapes depend only on the
static (H, W, octaves, intervals, max_keypoints).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vitvs_tpu.classical.features import (_blur, shift_clamped,
                                          sift_like_descriptors,
                                          top_k_scores)

SIGMA0 = 1.6


class MultiScaleFeatures(NamedTuple):
    uv: jnp.ndarray        # (K, 2) float (u, v) base-resolution, subpixel
    scale: jnp.ndarray     # (K,) descriptor window multiplier (base pixels)
    response: jnp.ndarray  # (K,) |DoG| at the refined extremum
    valid: jnp.ndarray     # (K,) bool
    desc: jnp.ndarray      # (K, 128) SIFT-style descriptors


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool downsample of (H, W)."""
    h, w = img.shape
    return img[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2).mean((1, 3))


def _gauss_stack(img: jnp.ndarray, intervals: int) -> tuple[jnp.ndarray, list[float]]:
    """Incremental Gaussian stack: sigmas SIGMA0 * 2^(i/intervals),
    i = 0..intervals+2 (SIFT's s+3 images per octave)."""
    sigmas = [SIGMA0 * (2.0 ** (i / intervals)) for i in range(intervals + 3)]
    levels = [_blur(img, sigmas[0])]
    for i in range(1, len(sigmas)):
        inc = math.sqrt(sigmas[i] ** 2 - sigmas[i - 1] ** 2)
        levels.append(_blur(levels[-1], inc))
    return jnp.stack(levels), sigmas


def _octave_extrema(
    dog: jnp.ndarray,
    contrast_thresh: float,
    edge_ratio: float,
    border: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(S+2, H, W) DoG -> (score, off_y, off_x) per interior level.

    score is |refined response| where a 26-neighbor extremum passes contrast
    and edge tests, else -inf; offsets are the clamped subpixel corrections.
    Returns arrays of shape (S, H, W) for levels 1..S.
    """
    L, H, W = dog.shape
    inner = dog[1:-1]  # (S, H, W)

    # 3x3x3 neighborhood max/min centered on each interior-level voxel
    d4 = dog[None]  # (1, L, H, W)
    mx = jax.lax.reduce_window(d4, -jnp.inf, jax.lax.max, (1, 3, 3, 3),
                               (1, 1, 1, 1), "SAME")[0]
    mn = jax.lax.reduce_window(d4, jnp.inf, jax.lax.min, (1, 3, 3, 3),
                               (1, 1, 1, 1), "SAME")[0]
    is_ext = ((inner >= mx[1:-1]) & (inner > contrast_thresh)) | (
        (inner <= mn[1:-1]) & (inner < -contrast_thresh))

    # finite differences on each interior level (spatial only); edge-clamped
    # shifts, NOT roll — periodic wrap would mix opposite image edges into
    # the boundary-ring derivatives (features.shift_clamped)
    sh = shift_clamped

    dx = 0.5 * (sh(inner, 0, -1) - sh(inner, 0, 1))
    dy = 0.5 * (sh(inner, -1, 0) - sh(inner, 1, 0))
    dxx = sh(inner, 0, -1) + sh(inner, 0, 1) - 2 * inner
    dyy = sh(inner, -1, 0) + sh(inner, 1, 0) - 2 * inner
    dxy = 0.25 * (sh(inner, -1, -1) + sh(inner, 1, 1)
                  - sh(inner, -1, 1) - sh(inner, 1, -1))

    # Lowe's edge rejection: tr^2/det < (r+1)^2/r with det > 0
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr * edge_ratio
                           < (edge_ratio + 1) ** 2 * det)

    # subpixel: solve [dxx dxy; dxy dyy] [ox; oy] = -[dx; dy]
    denom = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    ox = jnp.clip(-(dyy * dx - dxy * dy) / denom, -0.5, 0.5)
    oy = jnp.clip(-(dxx * dy - dxy * dx) / denom, -0.5, 0.5)
    refined = inner + 0.5 * (dx * ox + dy * oy)

    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    inside = ((rows >= border) & (rows < H - border)
              & (cols >= border) & (cols < W - border))
    score = jnp.where(is_ext & edge_ok & inside, jnp.abs(refined), -jnp.inf)
    return score, oy, ox


def sift_features(
    img: jnp.ndarray,
    max_keypoints: int = 512,
    octaves: int = 3,
    intervals: int = 3,
    contrast_thresh: float = 0.008,
    edge_ratio: float = 10.0,
    border: int = 8,
) -> MultiScaleFeatures:
    """Full SIFT-role pipeline on one grayscale image (H, W) in [0, 1]:
    DoG keypoints over `octaves` octaves + scale-adapted 128-d descriptors.

    Fixed-shape: exactly `max_keypoints` slots (max_keypoints // octaves per
    octave), invalid slots masked.  Descriptors are sampled from the octave
    BASE image (pre-blur) with the keypoint's within-octave sigma scaling
    the window — measured markedly better than sampling the Gaussian levels
    on this benchmark (NN-acc 0.79 vs 0.62; see the comment at the sampling
    site).
    """
    per_oct = max_keypoints // octaves
    assert per_oct > 0

    uv_all, sc_all, rs_all, va_all, ds_all = [], [], [], [], []
    img_o = img
    for o in range(octaves):
        stride = float(2 ** o)
        gauss, sigmas = _gauss_stack(img_o, intervals)
        dog = gauss[1:] - gauss[:-1]  # (S+2, h, w)
        score, oy, ox = _octave_extrema(dog, contrast_thresh, edge_ratio, border)

        S, h, w = score.shape
        flat = score.reshape(-1)
        top, idx = top_k_scores(flat, per_oct)
        lvl = idx // (h * w)
        yy = (idx % (h * w)) // w
        xx = idx % w
        off_y = oy.reshape(-1)[idx]
        off_x = ox.reshape(-1)[idx]
        valid = jnp.isfinite(top)

        # descriptor sampling: the octave BASE image (pre-blur) with the
        # keypoint's within-octave sigma scaling the window — measured
        # (r2): descriptors on the unblurred base discriminate markedly
        # better on this benchmark's fine textures than on the Gaussian
        # levels (NN-acc 0.79 vs 0.62 at ground-truth correspondences)
        k_rel = jnp.asarray([sigmas[i + 1] / SIGMA0 for i in range(S)],
                            jnp.float32)[lvl]
        uv_o = jnp.stack([xx.astype(jnp.float32) + off_x,
                          yy.astype(jnp.float32) + off_y], axis=-1)
        desc = sift_like_descriptors(img_o, uv_o, scale=k_rel)

        uv_all.append(uv_o * stride + (stride - 1.0) / 2.0)
        sc_all.append(k_rel * stride)
        rs_all.append(top)
        va_all.append(valid)
        ds_all.append(desc)
        if o + 1 < octaves:
            img_o = _downsample2(img_o)

    pad = max_keypoints - per_oct * octaves
    out = MultiScaleFeatures(
        uv=jnp.concatenate(uv_all),
        scale=jnp.concatenate(sc_all),
        response=jnp.concatenate(rs_all),
        valid=jnp.concatenate(va_all),
        desc=jnp.concatenate(ds_all),
    )
    if pad:
        out = MultiScaleFeatures(
            uv=jnp.pad(out.uv, ((0, pad), (0, 0))),
            scale=jnp.pad(out.scale, (0, pad), constant_values=1.0),
            response=jnp.pad(out.response, (0, pad), constant_values=-jnp.inf),
            valid=jnp.pad(out.valid, (0, pad)),
            desc=jnp.pad(out.desc, ((0, pad), (0, 0))),
        )
    return out
