"""Descriptor extraction: facets + log-binning, replacing
`ViTExtractor.extract_descriptors` / `_log_bin` (reference
`dinov2_extractor.py:265-353`).

The reference's `_log_bin` is a quadruple-nested Python loop over patch
coordinates; here it is a fixed set of edge-clamped spatial shifts of
average-pooled feature maps — pure vectorized XLA ops, fused into the
surrounding graph.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from vitvs_tpu.core import image as image_ops
from vitvs_tpu.models import vit as vit_mod
from vitvs_tpu.models.vit import ViTConfig, ViTParams, make_config, vit_features


def _avg_pool_same(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """AvgPool2d(win, stride=1, padding=win//2, count_include_pad=False)
    over (B, H, W, D), matching torch semantics (dinov2_extractor.py:285)."""
    if win == 1:
        return x
    pad = win // 2
    dims = (1, win, win, 1)
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, (1, 1, 1, 1), pads)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, (1, 1, 1, 1), pads)
    return summed / count


def log_bin(
    feats: jnp.ndarray, grid: tuple[int, int], hierarchy: int = 1
) -> jnp.ndarray:
    """Log-binned descriptors.

    feats: (B, t, D) patch features laid out row-major on `grid` = (gh, gw).
    Returns (B, t, D * num_bins) with num_bins = 1 + 8 * hierarchy.

    Bin layout matches the reference exactly (dinov2_extractor.py:288-311):
    for hierarchy level k (pool window 3^k), the 3x3 neighborhood offsets
    {-3^k, 0, +3^k}^2 in row-major order, skipping the centre for k > 0,
    sampled from the level-k average pool with EDGE-CLAMPED indices.
    """
    B, t, D = feats.shape
    gh, gw = grid
    assert t == gh * gw, f"feats tokens {t} != grid {gh}x{gw}"
    x = feats.reshape(B, gh, gw, D)

    parts = []
    ys = jnp.arange(gh)
    xs = jnp.arange(gw)
    for k in range(hierarchy):
        step = 3 ** k
        pooled = _avg_pool_same(x, step)
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if k != 0 and dy == 0 and dx == 0:
                    continue
                iy = jnp.clip(ys + dy, 0, gh - 1)
                ix = jnp.clip(xs + dx, 0, gw - 1)
                parts.append(pooled[:, iy][:, :, ix])
    out = jnp.concatenate(parts, axis=-1)  # (B, gh, gw, D * num_bins)
    return out.reshape(B, gh * gw, -1)


def extract_descriptors(
    params: ViTParams,
    cfg: ViTConfig,
    images: jnp.ndarray,
    layer: int = 11,
    facet: str = "token",
    bin: bool = False,
    include_cls: bool = False,
    hierarchy: int = 1,
    compute_dtype=jnp.float32,
    precision=None,
    quantized: bool = False,
) -> jnp.ndarray:
    """Dense patch descriptors, shape (B, 1, t, d') — same layout as the
    reference `extract_descriptors` (dinov2_extractor.py:313-337).

    facet 'token': d' = D;   'key'/'query'/'value': d' = D (heads folded,
    reference ordering: per-component-then-head);  bin=True: d' *= 9.

    quantized=True serves the int8 W8A8 path (models/quant.py; params must
    come from `quantize_vit_params`).
    """
    assert facet in ("token", "query", "value", "key")
    if quantized:
        from vitvs_tpu.models.quant import vit_features_quant

        feats = vit_features_quant(params, cfg, images, layer, facet,
                                   compute_dtype, precision)
    else:
        feats = vit_features(params, cfg, images, layer, facet, compute_dtype, precision)
    if facet == "token":
        x = feats  # (B, 1+t, D)
    else:
        # (B, h, 1+t, hd) -> (B, 1+t, hd, h) -> (B, 1+t, hd*h): matches the
        # reference's permute(0,2,3,1).flatten(-2,-1) head folding
        # (dinov2_extractor.py:334).
        x = jnp.transpose(feats, (0, 2, 3, 1))
        x = x.reshape(x.shape[0], x.shape[1], -1)
    if include_cls:
        assert not bin, "bin and include_cls are mutually exclusive"
        return x[:, None, :, :]
    x = x[:, 1:, :]  # drop cls token
    if bin:
        # dtype-preserving: binned descriptors stay in the compute dtype so
        # the downstream similarity matmul runs at full MXU rate
        h, w = images.shape[-3], images.shape[-2]
        x = log_bin(x, cfg.num_patches(h, w), hierarchy)
    return x[:, None, :, :]


def extract_saliency_maps(
    params: ViTParams,
    cfg: ViTConfig,
    images: jnp.ndarray,
    layer: int | None = None,
    head_idxs=(0, 2, 4, 5),
    compute_dtype=jnp.float32,
    precision=None,
) -> jnp.ndarray:
    """[0,1]-normalized cls-attention saliency, (B, t).  Generalizes the
    reference's dino_vits8-only implementation (dinov2_extractor.py:339-353)."""
    layer = cfg.depth - 1 if layer is None else layer
    attn = vit_features(params, cfg, images, layer, "attn", compute_dtype, precision)
    cls_attn = attn[:, jnp.asarray(head_idxs), 0, 1:].mean(axis=1)  # (B, t)
    lo = cls_attn.min(axis=1, keepdims=True)
    hi = cls_attn.max(axis=1, keepdims=True)
    return (cls_attn - lo) / (hi - lo)


@dataclasses.dataclass
class DescriptorExtractor:
    """Convenience stateful wrapper mirroring the reference `ViTExtractor`
    API (model name + stride + device-free), with jit caching per shape."""

    params: ViTParams
    cfg: ViTConfig
    compute_dtype: Any = jnp.float32

    @classmethod
    def random_init(cls, model_name: str = "dinov2_vits14", stride: int | None = None,
                    seed: int = 0, compute_dtype=jnp.float32) -> "DescriptorExtractor":
        cfg = make_config(model_name, stride)
        params = vit_mod.init_vit(cfg, jax.random.PRNGKey(seed))
        return cls(params=params, cfg=cfg, compute_dtype=compute_dtype)

    @property
    def mean(self):
        return image_ops.IMAGENET_MEAN if "dino" in self.cfg.model_name else image_ops.HALF_MEAN

    @property
    def std(self):
        return image_ops.IMAGENET_STD if "dino" in self.cfg.model_name else image_ops.HALF_STD

    def preprocess(self, rgb: jnp.ndarray, input_size: int) -> jnp.ndarray:
        return image_ops.preprocess_frame(rgb, input_size, self.mean, self.std)

    @functools.cached_property
    def _jitted(self):
        return jax.jit(
            functools.partial(extract_descriptors, compute_dtype=self.compute_dtype),
            static_argnames=("layer", "facet", "bin", "include_cls", "hierarchy", "cfg"),
        )

    def extract_descriptors(self, images: jnp.ndarray, layer: int = 11,
                            facet: str = "token", bin: bool = False,
                            include_cls: bool = False) -> jnp.ndarray:
        return self._jitted(self.params, self.cfg, images, layer=layer, facet=facet,
                            bin=bin, include_cls=include_cls)
