"""DINOv2-style Vision Transformer, pure JAX.

Replaces the reference's torch-hub model + forward-hook machinery
(`catkin_ws/ibvs/src/dinov2_extractor.py:14-263`) with a functional ViT whose
intermediate "facets" (token / key / query / value / attn) are ordinary return
values of the jitted forward — no hooks, no mutation.

TPU-first design decisions
--------------------------
* Block parameters are STACKED along a leading depth axis so the transformer
  body is one `lax.scan` — a single compiled block program regardless of
  depth, with weights streamed HBM->VMEM by XLA's pipelined loop.
* Facet extraction at layer L runs ONLY blocks 0..L (the reference runs the
  full model and discards everything after the hook — here the computation
  after the extraction point simply does not exist in the graph).
* Positional-embedding resampling happens at TRACE time for a static input
  size, reproducing torch's bicubic `scale_factor=(n+0.1)/sqrt(N)` semantics
  (`dinov2_extractor.py:94-120` and DINOv2's own interpolate_pos_encoding).
* Matmuls run in a configurable compute dtype (bfloat16 on the MXU by
  default); layernorm statistics and attention softmax stay float32.
* Patch embedding with stride == patch size is a reshape + one matmul (no
  conv); overlapping strides fall back to `lax.conv_general_dilated`.

Architecture parity: pre-norm blocks with LayerScale and an SDPA attention,
matching the vendored DINOv2 block (`dino_patch/block.py:44-117`,
`dino_patch/attention.py:37-83`); DINO-v1 presets disable LayerScale.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vitvs_tpu.core.image import interpolate_bicubic_scale_factor

ViTParams = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pos_grid: int = 37           # pretrained pos-embed grid (518/14 for DINOv2)
    use_layerscale: bool = True  # DINOv2 yes, DINO v1 no
    qkv_bias: bool = True
    stride: int = 14             # patch-embed stride override (dinov2_extractor.py:122-144)
    ln_eps: float = 1e-6
    # attention implementation.  'xla' default: at ViT-VS sequence lengths
    # (<= 1370 tokens) XLA's fused attention outperforms the single-pass
    # Pallas kernel (measured 3.33 vs 4.19 ms/forward for ViT-B@518 on v5e);
    # 'pallas' (ops/attention.py) is kept for long-sequence configurations.
    # 'xla' | 'pallas' | 'fast' | 'auto' (= pallas on TPU); a '-interpret'
    # suffix runs the Pallas kernel in interpreter mode so CPU tests can
    # exercise the TPU serving path inside the full pipeline
    attn_impl: str = "xla"
    # lax.scan unroll factor over the stacked blocks
    scan_unroll: int = 1
    # rematerialize each block under reverse-mode AD (training-memory knob;
    # inference graphs are unaffected — no cotangents, nothing to store)
    remat_blocks: bool = False
    # non-overlapping patch-embed lowering: 'reshape' (explicit 6D transpose
    # + one matmul — the profiled default), 'conv' (lax conv, stride=patch),
    # or 'einsum6' (direct 6D contraction, XLA picks the layout strategy).
    # All bit-identical up to float association; a serving A/B knob for the
    # ~45 us/iter of patchify relayout copies at ViT-B@518.
    patch_embed_impl: str = "reshape"
    # tanh-approximate GELU: cheaper on the VPU than exact erf; descriptor
    # differences are ~1e-3 relative (cosine-matching invariant in practice).
    # Exact erf is kept the default for torch parity.
    gelu_approx: bool = False
    # keep LayerNorm statistics in f32 (parity default); False computes them
    # in the compute dtype — faster VPU path, bf16-level descriptor error
    ln_f32: bool = True
    # attention softmax accumulation dtype (f32 parity default)
    softmax_f32: bool = True
    # int8-serving attention mode (models/quant.py only): 'none' keeps the
    # score/value matmuls in bf16; 'pv' quantizes probs@V using the row-max
    # trick (probs row max == 1/denom after max subtraction, so the int8
    # quantization replaces the softmax division); 'qk+pv' also runs QK^T in
    # int8 with per-(token, head) scales; 'fused' runs the single-pass
    # Pallas kernel (ops/attn_int8.py) — int8 QK^T with in-register dequant,
    # scores VMEM-resident, natural-layout I/O.  Default 'none': under XLA
    # the extra quantize fusions of 'pv'/'qk+pv' cost more HBM passes than
    # the int8 MXU saves (measured 2.50 vs 2.37 ms/iter ViT-B@518 serving
    # step); 'fused' is the measured-on-hardware candidate to flip.
    quant_attn: str = "none"
    # 'nomax' (serving-only): pure-XLA no-max softmax — logits are clamped
    # at `nomax_clamp` instead of row-max-subtracted, and the 1/denom
    # normalization is deferred onto the PV output. Removes two full VPU
    # passes over the (T x T) probs matrix, which ROOFLINE.md shows is the
    # attention bound; exact to ~f32 rounding while every row's logits stay
    # within ~80 of the clamp (exp underflow floor).
    # 'nomax2' further strips the probs-sized VPU work to [min, exp] alone:
    # the 1/sqrt(hd) scale folds into Q (T x hd elements, fused into the QKV
    # dequant epilogue — 22.5x fewer multiplies at ViT-B@518) and the
    # `- clamp` shift is dropped outright: with clamp = 30, exp(min(ls, 30))
    # <= 1.07e13 and row sums <= 1.5e16, far inside f32 range, and the
    # softmax quotient is shift-invariant so the result is identical to
    # ~f32 rounding.  Same bounded-logits serving precondition as 'nomax'.
    # 'nomax3' additionally folds log2(e) into Q (exp -> native exp2, no
    # hidden conversion multiply) and keeps the probs in the compute dtype
    # end-to-end — no f32 up-cast or bf16 down-cast passes; bf16 probs carry
    # ~0.4% relative error, the same step size as the int8-probs 'pv' path.
    nomax_clamp: float = 30.0
    # ---- serving-oriented attention redesigns (opt-in; NOT reference
    # parity — they change the function, so descriptors must be re-trained
    # in-sim, scripts/train_servo.py, and the operating point re-validated
    # closed-loop before use; docs/ROOFLINE.md has the motivating math).
    # attn_score: 'softmax' (parity default) | 'relu' | 'sqrelu'.
    #   relu/sqrelu replace exp with max(0, .) (optionally squared) under the
    #   same deferred 1/denom normalization as 'nomax': the probs-sized VPU
    #   pass loses its transcendental and needs no clamp or row max (scores
    #   are bounded by the logits themselves), and the 1/sqrt(hd) logit
    #   scale drops out entirely — relu(c*s)/sum relu(c*s) is scale-invariant
    #   (for sqrelu c^2 cancels the same way), so the scores feed the MXU
    #   exactly as the QKV epilogue produced them.  A row with no positive
    #   logit outputs zeros (denom floor); fine-tuning learns around it.
    attn_score: str = "softmax"
    # kv_pool: mean-pool K and V pool x pool over the patch grid before the
    # score matmul (the CLS row passes through): T_k shrinks ~pool^2, cutting
    # the QK^T and PV MXU work and the probs VPU pass by the same factor
    # while queries stay dense (one output token per input patch, as the
    # dense-descriptor matcher requires).  Square patch grids only.
    # Non-default values force the XLA attention path (attn_impl ignored).
    kv_pool: int = 1
    # kv_pool_impl: 'window' reshapes to the grid and window-sums (VPU
    # reshape/pad/concat chain); 'matmul' applies one static (T_out, T_in)
    # pooling matrix on the token axis — no layout churn, MXU-shaped, and
    # fusable with the surrounding attention matmuls.  Bit-comparable means
    # up to f32 summation order; the A/B measured the window chain +27%
    # SLOWER than no pooling at ViT-B@518 (artifacts/logs/ab_redesign.log),
    # which is what this variant exists to isolate.
    kv_pool_impl: str = "window"
    # kv_pool_where: 'post' pools K and V after the fused qkv projection
    # (the r4-validated layout); 'pre' exploits that mean pooling commutes
    # with the per-token linear projection (P@(XW) == (P@X)W, and each mean
    # row sums to 1 so the bias passes through exactly): the normed tokens
    # are pooled FIRST and the K/V projection runs on T_p tokens instead of
    # T — at pool3/518 that is 170 vs 1370 rows through the K/V half of the
    # qkv matmul, ~2.2x fewer qkv MACs, identical math up to float
    # association (int8: up to quantization rounding).  'pre' implies the
    # matmul pooling (there is no k/v grid to window-pool).
    kv_pool_where: str = "post"
    # FFN family: 'mlp' (GELU) or 'swiglu' (DINOv2-giant's SwiGLUFFNFused)
    ffn: str = "mlp"
    # explicit FFN hidden width; None = int(embed_dim * mlp_ratio) for mlp,
    # or the DINOv2 fused-SwiGLU width round8(embed_dim * mlp_ratio * 2/3)
    ffn_hidden: int | None = None
    # 'dino' models normalize with ImageNet stats, timm ones with 0.5 (extractor.py:49-50)
    model_name: str = "dinov2_vits14"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def hidden_dim(self) -> int:
        if self.ffn_hidden is not None:
            return self.ffn_hidden
        h = int(self.embed_dim * self.mlp_ratio)
        if self.ffn == "swiglu":
            return (int(h * 2 / 3) + 7) // 8 * 8
        return h

    def num_patches(self, h: int, w: int) -> tuple[int, int]:
        """Patch-grid shape for an input of (h, w), honoring the stride
        override (reference `_extract_features`, dinov2_extractor.py:262)."""
        return (
            1 + (h - self.patch_size) // self.stride,
            1 + (w - self.patch_size) // self.stride,
        )


PRESETS: dict[str, dict] = {
    # DINOv2 family (torch.hub facebookresearch/dinov2)
    "dinov2_vits14": dict(patch_size=14, embed_dim=384, depth=12, num_heads=6, pos_grid=37),
    "dinov2_vitb14": dict(patch_size=14, embed_dim=768, depth=12, num_heads=12, pos_grid=37),
    "dinov2_vitl14": dict(patch_size=14, embed_dim=1024, depth=24, num_heads=16, pos_grid=37),
    "dinov2_vitg14": dict(patch_size=14, embed_dim=1536, depth=40, num_heads=24, pos_grid=37, ffn="swiglu"),
    # DINO v1 family (pos grid 224/p; no LayerScale)
    "dino_vits8": dict(patch_size=8, embed_dim=384, depth=12, num_heads=6, pos_grid=28, use_layerscale=False),
    "dino_vits16": dict(patch_size=16, embed_dim=384, depth=12, num_heads=6, pos_grid=14, use_layerscale=False),
    "dino_vitb8": dict(patch_size=8, embed_dim=768, depth=12, num_heads=12, pos_grid=28, use_layerscale=False),
    "dino_vitb16": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12, pos_grid=14, use_layerscale=False),
    # timm ViTs load DINO-v1 architecture weights in the reference
    # (dinov2_extractor.py:70-82); same architectures here.
    "vit_small_patch16_224": dict(patch_size=16, embed_dim=384, depth=12, num_heads=6, pos_grid=14, use_layerscale=False),
    "vit_small_patch8_224": dict(patch_size=8, embed_dim=384, depth=12, num_heads=6, pos_grid=28, use_layerscale=False),
    "vit_base_patch16_224": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12, pos_grid=14, use_layerscale=False),
    "vit_base_patch8_224": dict(patch_size=8, embed_dim=768, depth=12, num_heads=12, pos_grid=28, use_layerscale=False),
}


def make_config(model_name: str, stride: int | None = None) -> ViTConfig:
    if model_name.startswith("pixel"):
        from vitvs_tpu.models.baselines import pixel_config

        return pixel_config(model_name)
    if model_name not in PRESETS:
        raise ValueError(f"unknown model {model_name!r}; options: {sorted(PRESETS)}")
    kw = dict(PRESETS[model_name])
    patch = kw["patch_size"]
    if stride is None:
        stride = patch
    if (patch // stride) * stride != patch and stride != patch:
        # reference asserts stride divides patch_size (dinov2_extractor.py:137)
        raise ValueError(f"stride {stride} must divide patch size {patch}")
    return ViTConfig(model_name=model_name, stride=stride, **kw)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_vit(cfg: ViTConfig, key: jax.Array, dtype=jnp.float32) -> ViTParams:
    """Random (truncated-normal) initialization in the converted-weights
    layout.  Real runs load converted DINOv2 checkpoints (models/convert.py)."""
    k = jax.random.split(key, 8)
    D, L = cfg.embed_dim, cfg.depth
    H = cfg.hidden_dim
    P = cfg.patch_size
    fc1_out = 2 * H if cfg.ffn == "swiglu" else H
    N = cfg.pos_grid * cfg.pos_grid

    def tn(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * std).astype(dtype)

    bk = jax.random.split(k[7], 10)
    params: ViTParams = {
        "patch_embed": {
            "kernel": tn(k[0], (P, P, 3, D)),  # HWIO
            "bias": jnp.zeros((D,), dtype),
        },
        "cls_token": tn(k[1], (D,)),
        "pos_embed": tn(k[2], (1 + N, D)),
        "blocks": {
            "norm1_scale": jnp.ones((L, D), dtype),
            "norm1_bias": jnp.zeros((L, D), dtype),
            # head-major qkv layout (L, D, 3, h, hd): a pure bitcast of the
            # flat (L, D, 3D) [q|k|v] columns, stored reshaped so the
            # tensor-parallel head sharding (parallel/mesh.py) aligns with a
            # real axis — a flat layout sharded over 3D splits mid-K and
            # forces GSPMD to all-gather the qkv activation every block.
            # Legacy flat checkpoints still load (forward handles both).
            "qkv_kernel": tn(bk[0], (L, D, 3, cfg.num_heads, cfg.head_dim)),
            "qkv_bias": jnp.zeros((L, 3, cfg.num_heads, cfg.head_dim), dtype),
            "proj_kernel": tn(bk[1], (L, D, D)),
            "proj_bias": jnp.zeros((L, D), dtype),
            "ls1": jnp.full((L, D), 1e-5 if cfg.use_layerscale else 1.0, dtype),
            "norm2_scale": jnp.ones((L, D), dtype),
            "norm2_bias": jnp.zeros((L, D), dtype),
            "fc1_kernel": tn(bk[2], (L, D, fc1_out)),
            "fc1_bias": jnp.zeros((L, fc1_out), dtype),
            "fc2_kernel": tn(bk[3], (L, H, D)),
            "fc2_bias": jnp.zeros((L, D), dtype),
            "ls2": jnp.full((L, D), 1e-5 if cfg.use_layerscale else 1.0, dtype),
        },
        "norm_scale": jnp.ones((D,), dtype),
        "norm_bias": jnp.zeros((D,), dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float,
               f32: bool = True) -> jnp.ndarray:
    """LayerNorm; float32 statistics by default regardless of compute dtype."""
    xf = x.astype(jnp.float32) if f32 else x
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(xf.dtype) + bias.astype(xf.dtype)).astype(x.dtype)


def _pool_grid_dims(T: int, pool: int):
    g = int(round(math.sqrt(T - 1)))
    if g * g != T - 1:
        raise ValueError(f"kv_pool requires a square patch grid; got {T - 1}"
                         " spatial tokens")
    nw = -(-g // pool)
    return g, nw


@functools.lru_cache(maxsize=8)
def _pool_matrix(T: int, pool: int) -> np.ndarray:
    """Static (1+nw*nw, T) mean-pooling matrix over the (1 + g*g)-token axis:
    row 0 passes CLS through; window rows hold 1/count at their member
    patches (edge windows of odd grids use their true element count)."""
    g, nw = _pool_grid_dims(T, pool)
    P = np.zeros((1 + nw * nw, T), np.float32)
    P[0, 0] = 1.0
    for wi in range(nw):
        rows = range(wi * pool, min((wi + 1) * pool, g))
        for wj in range(nw):
            cols = range(wj * pool, min((wj + 1) * pool, g))
            w = 1.0 / (len(rows) * len(cols))
            for r in rows:
                for c in cols:
                    P[1 + wi * nw + wj, 1 + r * g + c] = w
    return P


def _pool_kv(t: jnp.ndarray, pool: int, impl: str = "window",
             precision=None) -> jnp.ndarray:
    """Mean-pool the spatial tokens of (B, 1+g*g, h, hd) `pool` x `pool` over
    the patch grid; the CLS token passes through.  Edge windows of odd grids
    average their true element count (not the padded window size)."""
    if pool <= 1:
        return t
    B, T, h, hd = t.shape
    if impl == "matmul":
        # one token-axis matmul with a static pooling matrix: no grid
        # reshape/pad/concat chain, MXU-shaped and fusable (see ViTConfig).
        # `precision` is the caller's matmul precision so f32/training mode
        # pools at the same accuracy as every other matmul in the block
        # (bf16-HIGHEST is NOT used: it stalls the remote TPU compile).
        P = jnp.asarray(_pool_matrix(T, pool), t.dtype)
        return jnp.einsum("ot,bthd->bohd", P, t, precision=precision)
    if impl != "window":
        raise ValueError(f"unknown kv_pool_impl {impl!r} "
                         "(expected 'window' or 'matmul')")
    g, _ = _pool_grid_dims(T, pool)
    cls, sp = t[:, :1], t[:, 1:].reshape(B, g, g, h * hd)
    nw = -(-g // pool)
    pad = nw * pool - g
    if pad:
        sp = jnp.pad(sp, ((0, 0), (0, pad), (0, pad), (0, 0)))
    # zero-pad + reshape + sum (differentiable, unlike a generic
    # lax.reduce_window) — edge means divide by true counts below
    sums = sp.reshape(B, nw, pool, nw, pool, h * hd).sum(axis=(2, 4))
    cnt = np.full(nw, pool, np.float32)
    if pad:
        cnt[-1] = g - pool * (nw - 1)
    inv = jnp.asarray(1.0 / (cnt[:, None] * cnt[None, :]), t.dtype)
    pooled = (sums * inv[None, :, :, None]).reshape(B, nw * nw, h, hd)
    return jnp.concatenate([cls, pooled], axis=1)


def _score_attention(q, k, v, cfg: ViTConfig, out_dtype, precision,
                     score_dtype=None) -> jnp.ndarray:
    """relu / sqrelu scored attention with deferred normalization (see
    ViTConfig.attn_score).  q (B,Tq,h,hd), k/v (B,Tk,h,hd) -> (B,Tq,h,hd).
    No logit scale: it cancels in the normalized quotient.

    The SINGLE implementation of the redesign semantics — the bf16 path,
    the int8 serving path (quant._attn_unfused) and static calibration
    (quant collect-amax) all call here, differing only in `score_dtype`
    (None = cfg.softmax_f32 policy; serving passes its compute dtype to
    keep the probs-sized pass in bf16)."""
    if cfg.attn_score not in ("relu", "sqrelu"):
        raise ValueError(f"unknown attn_score {cfg.attn_score!r} "
                         "(expected 'softmax', 'relu' or 'sqrelu')")
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=precision)
    if score_dtype is None:
        score_dtype = jnp.float32 if cfg.softmax_f32 else logits.dtype
    logits = logits.astype(score_dtype)
    e = jnp.maximum(logits, jnp.zeros((), logits.dtype))
    if cfg.attn_score == "sqrelu":
        e = e * e
    denom = jnp.maximum(jnp.sum(e, axis=-1, dtype=jnp.float32), 1e-6)
    pv = jnp.einsum("bhqk,bkhd->bqhd", e.astype(out_dtype), v,
                    precision=precision)
    return (pv.astype(jnp.float32)
            / jnp.transpose(denom, (0, 2, 1))[..., None]).astype(out_dtype)


def _qkv_project(x_norm: jnp.ndarray, bp: Dict[str, jnp.ndarray],
                 cfg: ViTConfig, precision) -> jnp.ndarray:
    """x_norm (B, T, D) -> qkv (B, T, 3, h, hd).

    Handles both weight layouts: head-major (D, 3, h, hd) — the storage
    init_vit/convert produce so tp sharding aligns with the head axis — and
    legacy flat (D, 3D) from pre-layout checkpoints.  They are bitcasts of
    each other (the flat [q|k|v] columns are comp-then-head-major), so the
    reshape below is free, rebinds any stored head split to THIS cfg's
    (h, hd), and yields identical results; only the sharding behavior
    differs under a tensor-parallel mesh."""
    h, hd = cfg.num_heads, cfg.head_dim
    w = bp["qkv_kernel"].reshape(bp["qkv_kernel"].shape[0], 3, h, hd)
    b = bp["qkv_bias"].reshape(3, h, hd)
    return jnp.einsum("btd,dchk->btchk", x_norm, w, precision=precision) + b


def _qkv_project_prepool(x_norm: jnp.ndarray, bp: Dict[str, jnp.ndarray],
                         cfg: ViTConfig, precision):
    """kv_pool_where='pre': pool the normed tokens, then project K/V on the
    pooled T_p tokens while Q projects densely (see ViTConfig.kv_pool_where;
    exactly equal to project-then-pool up to float association).
    Returns q (B,T,h,hd), k/v (B,Tp,h,hd)."""
    h, hd = cfg.num_heads, cfg.head_dim
    w = bp["qkv_kernel"].reshape(bp["qkv_kernel"].shape[0], 3, h, hd)
    b = bp["qkv_bias"].reshape(3, h, hd)
    P = jnp.asarray(_pool_matrix(x_norm.shape[1], cfg.kv_pool), x_norm.dtype)
    xp = jnp.einsum("ot,btd->bod", P, x_norm, precision=precision)
    q = jnp.einsum("btd,dhk->bthk", x_norm, w[:, 0], precision=precision) + b[0]
    kv = jnp.einsum("bod,dchk->bochk", xp, w[:, 1:], precision=precision) + b[1:]
    return q, kv[:, :, 0], kv[:, :, 1]


def _attention(
    x_norm: jnp.ndarray,
    bp: Dict[str, jnp.ndarray],
    cfg: ViTConfig,
    precision,
) -> jnp.ndarray:
    """SDPA attention matching `dino_patch/attention.py:70-80` semantics."""
    B, T, D = x_norm.shape
    h, hd = cfg.num_heads, cfg.head_dim
    if cfg.kv_pool > 1 and cfg.kv_pool_where == "pre":
        q, k, v = _qkv_project_prepool(x_norm, bp, cfg, precision)
    else:
        qkv = _qkv_project(x_norm, bp, cfg, precision)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, h, hd)
        if cfg.kv_pool > 1:
            k = _pool_kv(k, cfg.kv_pool, cfg.kv_pool_impl, precision)
            v = _pool_kv(v, cfg.kv_pool, cfg.kv_pool_impl, precision)
    interpret = cfg.attn_impl.endswith("-interpret")
    impl = cfg.attn_impl.removesuffix("-interpret")
    use_pallas = (impl in ("pallas", "fast") or (
        impl == "auto" and jax.default_backend() == "tpu"
    )) and cfg.attn_score == "softmax" and cfg.kv_pool == 1
    if cfg.attn_score != "softmax":
        out = _score_attention(q, k, v, cfg, x_norm.dtype, precision)
        out = out.reshape(B, T, D)
    elif use_pallas:
        from vitvs_tpu.ops.attention import mha_attention

        out = mha_attention(q, k, v, fast=impl == "fast",
                            interpret=interpret).reshape(B, T, D)
    else:
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=precision)
        if cfg.softmax_f32:
            logits = logits.astype(jnp.float32)
        probs = jax.nn.softmax(logits * scale, axis=-1).astype(x_norm.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=precision).reshape(B, T, D)
    return jnp.einsum("btd,de->bte", out, bp["proj_kernel"], precision=precision) + bp["proj_bias"]


def _mlp(x_norm: jnp.ndarray, bp: Dict[str, jnp.ndarray], cfg: ViTConfig, precision) -> jnp.ndarray:
    hidden = jnp.einsum("btd,dh->bth", x_norm, bp["fc1_kernel"], precision=precision) + bp["fc1_bias"]
    if cfg.ffn == "swiglu":
        # DINOv2 SwiGLUFFNFused: w12 fused -> silu(x1) * x2
        x1, x2 = jnp.split(hidden, 2, axis=-1)
        hidden = jax.nn.silu(x1) * x2
    else:
        hidden = jax.nn.gelu(hidden, approximate=cfg.gelu_approx)
    return jnp.einsum("bth,hd->btd", hidden, bp["fc2_kernel"], precision=precision) + bp["fc2_bias"]


def _block(x: jnp.ndarray, bp: Dict[str, jnp.ndarray], cfg: ViTConfig, precision) -> jnp.ndarray:
    """Pre-norm block with LayerScale (dino_patch/block.py:90-117, eval path)."""
    x = x + bp["ls1"] * _attention(_layernorm(x, bp["norm1_scale"], bp["norm1_bias"], cfg.ln_eps, cfg.ln_f32), bp, cfg, precision)
    x = x + bp["ls2"] * _mlp(_layernorm(x, bp["norm2_scale"], bp["norm2_bias"], cfg.ln_eps, cfg.ln_f32), bp, cfg, precision)
    return x


def _resample_pos_embed(pos_embed: jnp.ndarray, cfg: ViTConfig, gh: int, gw: int) -> jnp.ndarray:
    """Bicubic pos-embed resampling with the DINO '+0.1' scale-factor fudge
    (dinov2_extractor.py:107-115).  Static shapes — runs at trace time."""
    N = pos_embed.shape[0] - 1
    g = int(round(math.sqrt(N)))
    if gh == g and gw == g:
        return pos_embed
    cls_pos = pos_embed[:1]
    grid = pos_embed[1:].reshape(g, g, -1).astype(jnp.float32)
    # NOTE the reference computes scale (w0+0.1)/sqrt(N) for the first spatial
    # axis of a (1, dim, gh, gw) tensor laid out H-major; symmetric here.
    out = interpolate_bicubic_scale_factor(grid, (gh + 0.1) / g, (gw + 0.1) / g)
    assert out.shape[:2] == (gh, gw)
    out = out.reshape(gh * gw, -1).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pos, out], axis=0)


def _embed(params: ViTParams, cfg: ViTConfig, images: jnp.ndarray, precision) -> jnp.ndarray:
    """images (B, H, W, 3) -> tokens (B, 1+t, D) with pos embeddings added."""
    B, H, W, _ = images.shape
    gh, gw = cfg.num_patches(H, W)
    kern = params["patch_embed"]["kernel"]
    if cfg.stride == cfg.patch_size and cfg.patch_embed_impl != "conv":
        P = cfg.patch_size
        x = images[:, : gh * P, : gw * P, :]
        if cfg.patch_embed_impl == "einsum6":
            # direct 6D contraction — no materialized patch transpose
            x6 = x.reshape(B, gh, P, gw, P, 3)
            patches = jnp.einsum("bhpwqc,pqcd->bhwd", x6, kern,
                                 precision=precision).reshape(B, gh * gw, -1)
        else:
            # Non-overlapping patches: patchify is a reshape; embed is one
            # matmul.
            x = x.reshape(B, gh, P, gw, P, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, P * P * 3)
            w = kern.reshape(P * P * 3, -1)
            patches = jnp.einsum("btp,pd->btd", x, w, precision=precision)
    else:
        # conv requires matching dtypes; mirror einsum's promotion semantics
        ct = jnp.promote_types(images.dtype, kern.dtype)
        patches = jax.lax.conv_general_dilated(
            images.astype(ct), kern.astype(ct),
            window_strides=(cfg.stride, cfg.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        ).reshape(B, gh * gw, -1)
    patches = patches + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, patches], axis=1)
    pos = _resample_pos_embed(params["pos_embed"], cfg, gh, gw)
    return tokens + pos.astype(tokens.dtype)


# ---------------------------------------------------------------------------
# Public forwards
# ---------------------------------------------------------------------------


def _slice_blocks(blocks: Dict[str, jnp.ndarray], lo: int, hi: int) -> Dict[str, jnp.ndarray]:
    return {k: v[lo:hi] for k, v in blocks.items()}


def _take_block(blocks: Dict[str, jnp.ndarray], i: int) -> Dict[str, jnp.ndarray]:
    return {k: v[i] for k, v in blocks.items()}


def _run_blocks(x: jnp.ndarray, blocks: Dict[str, jnp.ndarray], cfg: ViTConfig, precision) -> jnp.ndarray:
    """lax.scan over stacked block params: one compiled block program."""
    nblocks = next(iter(blocks.values())).shape[0]
    if nblocks == 0:
        return x

    block = _block
    if cfg.remat_blocks:
        # trade FLOPs for HBM under reverse-mode AD: store only each block's
        # INPUT and recompute its internals (qkv, the (T x T) probs, mlp
        # hidden) in the backward pass.  Activation memory drops from
        # O(depth * T^2 * heads) to O(depth * T * D) — ViT-L/14 @ 518
        # training OOMs a 16 GB chip even at batch 2 without this
        block = jax.checkpoint(_block, static_argnums=(2, 3))

    def body(h, bp):
        return block(h, bp, cfg, precision), None

    x, _ = jax.lax.scan(body, x, blocks, unroll=min(cfg.scan_unroll, nblocks))
    return x


def vit_features(
    params: ViTParams,
    cfg: ViTConfig,
    images: jnp.ndarray,
    layer: int = 11,
    facet: str = "token",
    compute_dtype=jnp.float32,
    precision=None,
) -> jnp.ndarray:
    """Facet extraction, replacing the reference's forward hooks
    (`dinov2_extractor.py:193-263`).

    Returns:
      facet 'token'              -> (B, 1+t, D)   (block output, incl. cls)
      facet 'query'|'key'|'value'-> (B, h, 1+t, hd)
      facet 'attn'               -> (B, h, 1+t, 1+t) softmax attention probs

    Only blocks 0..layer are computed; nothing downstream of the extraction
    point enters the graph.
    """
    if facet not in ("token", "query", "key", "value", "attn"):
        raise ValueError(f"unsupported facet {facet!r}")
    x = _embed(params, cfg, images.astype(compute_dtype), precision)
    x = x.astype(compute_dtype)
    blocks = jax.tree.map(lambda a: a.astype(compute_dtype), params["blocks"])

    if facet == "token":
        x = _run_blocks(x, _slice_blocks(blocks, 0, layer + 1), cfg, precision)
        return x

    # qkv facets: run blocks 0..layer-1, then recompute qkv of block `layer`
    # from its normed input — exactly what the reference hook does
    # (dinov2_extractor.py:212-218).
    x = _run_blocks(x, _slice_blocks(blocks, 0, layer), cfg, precision)
    bp = _take_block(blocks, layer)
    x_norm = _layernorm(x, bp["norm1_scale"], bp["norm1_bias"], cfg.ln_eps, cfg.ln_f32)
    h, hd = cfg.num_heads, cfg.head_dim
    qkv = _qkv_project(x_norm, bp, cfg, precision)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, h, T, hd)
    if facet == "query":
        return qkv[0]
    if facet == "key":
        return qkv[1]
    if facet == "value":
        return qkv[2]
    # attn probs
    q, k = qkv[0], qkv[1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision).astype(jnp.float32)
    logits = logits / math.sqrt(hd)
    return jax.nn.softmax(logits, axis=-1)


def vit_forward(
    params: ViTParams,
    cfg: ViTConfig,
    images: jnp.ndarray,
    compute_dtype=jnp.float32,
    precision=None,
) -> jnp.ndarray:
    """Full forward through all blocks + final LayerNorm -> (B, 1+t, D)."""
    x = _embed(params, cfg, images.astype(compute_dtype), precision)
    blocks = jax.tree.map(lambda a: a.astype(compute_dtype), params["blocks"])
    x = _run_blocks(x.astype(compute_dtype), blocks, cfg, precision)
    return _layernorm(x, params["norm_scale"], params["norm_bias"], cfg.ln_eps)


def count_flops_per_image(cfg: ViTConfig, input_size: int, layer: int | None = None) -> float:
    """Matmul FLOPs of one facet forward (for bench reporting / cost models)."""
    gh, gw = cfg.num_patches(input_size, input_size)
    t = gh * gw + 1
    D, H = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    nblocks = (layer + 1) if layer is not None else cfg.depth
    per_block = (
        2 * t * D * 3 * D          # qkv
        + 2 * t * t * D * 2        # qk^T and probs@v
        + 2 * t * D * D            # proj
        + 2 * t * D * H * 2        # mlp
    )
    patch = 2 * t * (cfg.patch_size ** 2 * 3) * D
    return float(nblocks * per_block + patch)
