"""Binary-descriptor feature families: the ORB and AKAZE equivalents.

The reference dispatches three classical methods (ibvs_standard.py:336-347):
SIFT (float, NORM_L2), ORB (`cv2.ORB_create(nfeatures=1000)`, NORM_HAMMING)
and AKAZE (`cv2.AKAZE_create()`, NORM_HAMMING).  This module provides the
two binary families as fixed-shape XLA pipelines; Hamming matching runs as
an int8 MXU matmul (features.match_descriptors(norm='hamming')).

ORB equivalent — `orb_features`:
  * image pyramid (static levels, factor 1.33 — ORB's 1.2^1.5-ish ladder
    compressed to keep the trace small);
  * Harris corners per level (ORB itself ranks FAST corners by the Harris
    score; we use the Harris response directly);
  * orientation by the intensity centroid (Rosin moments) over a radius-15
    disc — exactly ORB's operator;
  * steered BRIEF: 256 fixed Gaussian test pairs, rotated by the keypoint
    orientation, compared on a sigma=2 smoothed image -> (256,) {0,1} int8.

AKAZE equivalent — `akaze_features`:
  * nonlinear (Perona-Malik g2) diffusion scale space — AKAZE's core idea:
    smoothing that preserves edges, built with fixed explicit FED-style
    steps;
  * scale-normalized determinant-of-Hessian detector per evolution level;
  * M-LDB descriptor: 2x2 / 3x3 / 4x4 grids over the oriented patch, per
    cell the means of (intensity, gx, gy), binarized by all pairwise
    cell comparisons per channel -> 486 bits, the exact M-LDB layout
    (Alcantarilla et al. 2013).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vitvs_tpu.classical.features import (
    _bilinear,
    _bilinear_packed,
    _blur,
    detect_corners,
    gradients,
    pack_quad,
    shift_clamped,
    top_k_scores,
)


class BinaryFeatures(NamedTuple):
    uv: jnp.ndarray     # (K, 2) float (u, v) base-resolution coords
    desc: jnp.ndarray   # (K, B) {0,1} int8
    valid: jnp.ndarray  # (K,) bool


# ---------------------------------------------------------------- ORB ----

def _brief_pattern(n_bits: int = 256, radius: float = 13.0,
                   seed: int = 7) -> np.ndarray:
    """Static BRIEF test pattern: (n_bits, 2, 2) of (x, y) offsets, Gaussian
    around the keypoint (BRIEF's G(0, S^2/25) recipe), clipped to the disc."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, radius / 2.0, (n_bits, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(norm > radius, pts * (radius / np.maximum(norm, 1e-9)), pts)
    return pts.astype(np.float32)


def orientation_centroid(img: jnp.ndarray, uv: jnp.ndarray,
                         radius: int = 15) -> jnp.ndarray:
    """ORB's intensity-centroid orientation: theta = atan2(m01, m10) over a
    disc of `radius` (Rublee et al. 2011, sec. 3.2)."""
    off = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    disc = (ox ** 2 + oy ** 2 <= radius ** 2).astype(jnp.float32)

    def one(pt):
        patch = _bilinear(img, pt[1] + oy, pt[0] + ox) * disc
        return jnp.arctan2(jnp.sum(patch * oy), jnp.sum(patch * ox))

    return jax.vmap(one)(uv)


def steered_brief(img_smooth: jnp.ndarray, uv: jnp.ndarray,
                  theta: jnp.ndarray, scale: jnp.ndarray | float = 1.0,
                  n_bits: int = 256) -> jnp.ndarray:
    """(K, n_bits) {0,1} int8 — BRIEF tests on the pattern rotated by theta
    and scaled per keypoint."""
    pat = jnp.asarray(_brief_pattern(n_bits))  # (n, 2, 2) (x, y)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (uv.shape[0],))

    def one(pt, th, sc):
        c, s = jnp.cos(th), jnp.sin(th)
        rx = (c * pat[..., 0] - s * pat[..., 1]) * sc  # (n, 2)
        ry = (s * pat[..., 0] + c * pat[..., 1]) * sc
        vals = _bilinear(img_smooth, pt[1] + ry, pt[0] + rx)  # (n, 2)
        return (vals[:, 0] < vals[:, 1]).astype(jnp.int8)

    return jax.vmap(one)(uv, theta, scale)


def orb_features(img: jnp.ndarray, nfeatures: int = 1000, levels: int = 4,
                 scale_factor: float = 4.0 / 3.0, border: int = 16,
                 quality: float = 0.01) -> BinaryFeatures:
    """ORB-role features on one grayscale (H, W) image in [0, 1].

    nfeatures=1000 matches `cv2.ORB_create(nfeatures=1000)`
    (ibvs_standard.py:341).  Fixed shape: nfeatures // levels slots per
    pyramid level, concatenated.
    """
    per = nfeatures // levels
    assert per > 0
    H, W = img.shape
    uv_all, ds_all, va_all = [], [], []
    level = img
    for l in range(levels):
        stride = scale_factor ** l
        smooth = _blur(level, 2.0)
        c = detect_corners(level, per, quality=quality, border=border)
        theta = orientation_centroid(smooth, c.uv)
        desc = steered_brief(smooth, c.uv, theta)
        uv_all.append(c.uv * stride + (stride - 1.0) / 2.0)
        ds_all.append(desc)
        va_all.append(c.valid)
        if l + 1 < levels:
            nh = max(int(round(H / scale_factor ** (l + 1))), 32)
            nw = max(int(round(W / scale_factor ** (l + 1))), 32)
            level = jax.image.resize(img, (nh, nw), "linear")
    return BinaryFeatures(
        uv=jnp.concatenate(uv_all),
        desc=jnp.concatenate(ds_all),
        valid=jnp.concatenate(va_all),
    )


def orientation_dominant_gradient(img: jnp.ndarray, uv: jnp.ndarray,
                                  radius: int = 8, n_bins: int = 36,
                                  window_bins: int = 6) -> jnp.ndarray:
    """SURF/AKAZE-style dominant orientation (Compute_Main_Orientation):
    Gaussian-weighted first-derivative samples over a disc, binned by angle;
    the densest 60-degree sliding window's summed gradient vector gives
    theta.  Far more stable than the intensity centroid on nonlinear-
    diffusion levels, whose flattened intensity makes m01/m10 tiny."""
    gx_img, gy_img = gradients(img)
    quad = pack_quad(img, gx_img, gy_img)
    hw = img.shape
    off = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    disc = (ox ** 2 + oy ** 2 <= radius ** 2)
    w = jnp.where(disc, jnp.exp(-(ox ** 2 + oy ** 2) / (2 * (radius / 2.0) ** 2)),
                  0.0).reshape(-1)

    def one(pt):
        vals = _bilinear_packed(quad, hw, pt[1] + oy, pt[0] + ox)
        gx = vals[..., 1].reshape(-1) * w
        gy = vals[..., 2].reshape(-1) * w
        ang = jnp.arctan2(gy, gx)  # [-pi, pi)
        b = jnp.clip(((ang + jnp.pi) * (n_bins / (2 * jnp.pi))).astype(jnp.int32),
                     0, n_bins - 1)
        onehot = jax.nn.one_hot(b, n_bins, dtype=gx.dtype)  # (S, n_bins)
        sx = onehot.T @ gx
        sy = onehot.T @ gy
        # circular sliding-window sum of `window_bins` adjacent bins
        wx = sum(jnp.roll(sx, -i) for i in range(window_bins))
        wy = sum(jnp.roll(sy, -i) for i in range(window_bins))
        best = jnp.argmax(wx * wx + wy * wy)
        return jnp.arctan2(wy[best], wx[best])

    return jax.vmap(one)(uv)


# -------------------------------------------------------------- AKAZE ----

def _diffuse(img: jnp.ndarray, steps: int, dt: float = 0.15,
             k: float = 0.03) -> jnp.ndarray:
    """Perona-Malik g2 nonlinear diffusion, explicit scheme.

    g = 1 / (1 + |grad L|^2 / k^2); L += dt * div(g * grad L).  `k` is the
    contrast parameter (AKAZE estimates it as the 70th gradient percentile;
    for [0,1] poster imagery a fixed 0.03 sits in that regime and keeps the
    graph shape-static)."""

    def step(L, _):
        gx, gy = gradients(L)
        g = 1.0 / (1.0 + (gx * gx + gy * gy) / (k * k))
        # divergence of g * grad L with reflecting (edge-clamped)
        # boundaries: jnp.roll would wrap periodically and leak opposite
        # image edges into the scale space (~1 px per step, deeper than the
        # keypoint border mask over the cumulative level steps)
        fx = g * gx
        fy = g * gy
        div = (0.5 * (_shift(fx, 0, -1) - _shift(fx, 0, 1))
               + 0.5 * (_shift(fy, -1, 0) - _shift(fy, 1, 0)))
        return L + dt * div, None

    out, _ = jax.lax.scan(step, img, None, length=steps)
    return out


_shift = shift_clamped   # shared stencil shift (classical/features.py)


def _hessian_det(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Scale-normalized determinant of Hessian."""
    s = _blur(img, sigma)
    sh = _shift

    lxx = sh(s, 0, -1) + sh(s, 0, 1) - 2 * s
    lyy = sh(s, -1, 0) + sh(s, 1, 0) - 2 * s
    lxy = 0.25 * (sh(s, -1, -1) + sh(s, 1, 1) - sh(s, -1, 1) - sh(s, 1, -1))
    return (sigma ** 2) * (lxx * lyy - lxy * lxy)


def mldb_descriptor(img: jnp.ndarray, uv: jnp.ndarray, theta: jnp.ndarray,
                    scale: jnp.ndarray | float = 1.0,
                    patch: float = 20.0, samples: int = 12) -> jnp.ndarray:
    """M-LDB: oriented patch -> 2x2/3x3/4x4 grids of per-cell means of
    (intensity, gx, gy); bits = all pairwise comparisons per grid per
    channel -> 6*3 + 36*3 + 120*3 = 486 bits."""
    gx, gy = gradients(img)
    # (img, gx, gy) sampled at identical coords: pack once, ONE gather per
    # sample point instead of 12 (see features.pack_quad)
    quad = pack_quad(img, gx, gy)
    hw = img.shape
    off = (jnp.arange(samples, dtype=jnp.float32) + 0.5) / samples - 0.5
    oy, ox = jnp.meshgrid(off, off, indexing="ij")  # in [-0.5, 0.5)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (uv.shape[0],))

    grids = (2, 3, 4)
    pairs = []
    for g in grids:
        idx = np.arange(g * g)
        a, b = np.meshgrid(idx, idx, indexing="ij")
        sel = a < b
        pairs.append((np.broadcast_to(a, sel.shape)[sel],
                      np.broadcast_to(b, sel.shape)[sel]))

    def one(pt, th, sc):
        c, s = jnp.cos(th), jnp.sin(th)
        ext = patch * sc
        rx = (c * ox - s * oy) * ext
        ry = (s * ox + c * oy) * ext
        vals = _bilinear_packed(quad, hw, pt[1] + ry, pt[0] + rx)
        # (samples, samples, 3) = (intensity, gx, gy).  The derivative
        # channels are image-frame vectors: rotate them into the keypoint's
        # canonical frame (AKAZE's MLDB_Fill_Values does exactly this —
        # without it 324 of the 486 bits decorrelate under in-plane spin,
        # measured as convergence falling 86% -> 33% over 0-45 deg).
        gxr = c * vals[..., 1] + s * vals[..., 2]
        gyr = -s * vals[..., 1] + c * vals[..., 2]
        vals = jnp.stack([vals[..., 0], gxr, gyr], axis=-1)
        bits = []
        for g, (ia, ib) in zip(grids, pairs):
            cell = (jnp.arange(samples) * g) // samples
            cid = cell[:, None] * g + cell[None, :]
            onehot = jax.nn.one_hot(cid.reshape(-1), g * g, dtype=vals.dtype)
            flat = vals.reshape(-1, 3)
            sums = onehot.T @ flat                     # (g*g, 3)
            counts = jnp.sum(onehot, axis=0)[:, None]
            means = sums / jnp.maximum(counts, 1.0)
            bits.append((means[jnp.asarray(ia)] > means[jnp.asarray(ib)])
                        .astype(jnp.int8).reshape(-1))
        return jnp.concatenate(bits)

    return jax.vmap(one)(uv, theta, scale)


def akaze_features(img: jnp.ndarray, max_keypoints: int = 512,
                   levels: int = 4, border: int = 16,
                   quality: float = 0.001) -> BinaryFeatures:
    """AKAZE-role features: nonlinear scale space + Hessian-det keypoints +
    M-LDB binary descriptors."""
    per = max_keypoints // levels
    assert per > 0
    H, W = img.shape

    uv_all, ds_all, va_all = [], [], []
    L = img
    sigma = 1.6
    for l in range(levels):
        if l:
            L = _diffuse(L, steps=6)
            sigma *= 1.6
        resp = _hessian_det(L, 1.0)
        rmax = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3),
                                     (1, 1), "SAME")
        rows = jnp.arange(H)[:, None]
        cols = jnp.arange(W)[None, :]
        inside = ((rows >= border) & (rows < H - border)
                  & (cols >= border) & (cols < W - border))
        score = jnp.where((resp >= rmax) & (resp > quality * jnp.max(resp))
                          & inside, resp, -jnp.inf)
        top, idx = top_k_scores(score.reshape(-1), per)
        uv = jnp.stack([(idx % W).astype(jnp.float32),
                        (idx // W).astype(jnp.float32)], axis=-1)
        valid = jnp.isfinite(top)
        theta = orientation_dominant_gradient(L, uv, radius=8)
        desc = mldb_descriptor(L, uv, theta, scale=sigma / 1.6)
        uv_all.append(uv)
        ds_all.append(desc)
        va_all.append(valid)
    return BinaryFeatures(
        uv=jnp.concatenate(uv_all),
        desc=jnp.concatenate(ds_all),
        valid=jnp.concatenate(va_all),
    )
