"""W8A8 int8 inference path for the ViT.

TPU v5e executes int8 x int8 -> int32 matmuls at twice the bf16 MXU rate.
The ViT's projection matmuls (qkv / attn-proj / mlp fc1 / fc2) carry ~80% of
the forward FLOPs, so quantizing them roughly halves descriptor-extraction
time while attention score/value matmuls, LayerNorm, softmax and residuals
stay in bf16/f32.

Scheme (standard dynamic-activation W8A8):
  * weights: symmetric per-output-channel int8, scale = max|w| / 127;
  * activations: symmetric per-token dynamic int8 (scales recomputed on the
    fly from the LayerNormed inputs — cheap VPU reductions);
  * accumulation in int32, dequantized by the outer product of scales.

This is a production-serving feature with no reference equivalent (the
reference runs full-precision torch on GPU); descriptor error is ~1%
relative, far below the cosine-matching noise floor — validated in
tests/test_quant.py against the bf16 pipeline.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vitvs_tpu.models import vit as vit_mod
from vitvs_tpu.models.vit import ViTConfig, ViTParams

QuantParams = Dict[str, Any]

_QUANT_KERNELS = ("qkv_kernel", "proj_kernel", "fc1_kernel", "fc2_kernel")


def _quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., in, out) f32 -> int8 values + (..., 1, out) f32 scales."""
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_vit_params(params: ViTParams) -> QuantParams:
    """Convert a f32/bf16 params pytree into the int8 serving layout."""
    blocks = params["blocks"]
    qblocks = dict(blocks)
    for name in _QUANT_KERNELS:
        qv, qs = _quantize_weight(blocks[name].astype(jnp.float32))
        qblocks[name] = qv
        qblocks[name + "_scale"] = qs
    out = dict(params)
    out["blocks"] = qblocks
    return out


def _dyn_quant_act(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, D) -> int8 values + (B, T, 1) f32 scales (per-token).

    The rescale+round runs in the input dtype (bf16 holds integers <= 256
    exactly), avoiding a full f32 materialization of the activations."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    inv = (1.0 / scale).astype(x.dtype)
    q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _q_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
              bias: jnp.ndarray | None, out_dtype) -> jnp.ndarray:
    """int8 dynamic-activation matmul: x (B,T,D) @ w_q (D,E) -> (B,T,E)."""
    x_q, x_scale = _dyn_quant_act(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale  # (B,T,E)*(B,T,1)*(1,E)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _block_q(x: jnp.ndarray, bp: Dict[str, jnp.ndarray], cfg: ViTConfig) -> jnp.ndarray:
    """Pre-norm block with int8 projections (mirrors vit._block)."""
    import math

    B, T, D = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    dt = x.dtype

    x_norm = vit_mod._layernorm(x, bp["norm1_scale"], bp["norm1_bias"],
                                cfg.ln_eps, cfg.ln_f32)
    qkv = _q_matmul(x_norm, bp["qkv_kernel"], bp["qkv_kernel_scale"][0],
                    bp["qkv_bias"], dt)
    qkv = qkv.reshape(B, T, 3, h, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if cfg.softmax_f32:
        logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(dt)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
    attn = _q_matmul(attn, bp["proj_kernel"], bp["proj_kernel_scale"][0],
                     bp["proj_bias"], dt)
    x = x + bp["ls1"].astype(dt) * attn

    x_norm = vit_mod._layernorm(x, bp["norm2_scale"], bp["norm2_bias"],
                                cfg.ln_eps, cfg.ln_f32)
    hmid = _q_matmul(x_norm, bp["fc1_kernel"], bp["fc1_kernel_scale"][0],
                     bp["fc1_bias"], dt)
    if cfg.ffn == "swiglu":
        # DINOv2 SwiGLUFFNFused (ViT-g): fused w12 output -> silu(x1) * x2,
        # mirroring vit._mlp
        x1, x2 = jnp.split(hmid, 2, axis=-1)
        hmid = jax.nn.silu(x1) * x2
    else:
        hmid = jax.nn.gelu(hmid, approximate=cfg.gelu_approx)
    mlp = _q_matmul(hmid, bp["fc2_kernel"], bp["fc2_kernel_scale"][0],
                    bp["fc2_bias"], dt)
    return x + bp["ls2"].astype(dt) * mlp


def _cast_block(bp: Dict[str, jnp.ndarray], compute_dtype) -> Dict[str, jnp.ndarray]:
    """int8 kernels and f32 scales pass through; everything else casts."""
    return {k: (v if k in _QUANT_KERNELS or k.endswith("_scale")
                else v.astype(compute_dtype))
            for k, v in bp.items()}


def vit_features_quant(
    qparams: QuantParams,
    cfg: ViTConfig,
    images: jnp.ndarray,
    layer: int = 11,
    facet: str = "token",
    compute_dtype=jnp.bfloat16,
    precision=None,
) -> jnp.ndarray:
    """int8 facet forward, same contract as vit.vit_features.

    facet 'token'               -> (B, 1+t, D)
    facet 'query'|'key'|'value' -> (B, h, 1+t, hd)
    facet 'attn'                -> (B, h, 1+t, 1+t)
    """
    import math

    if facet not in ("token", "query", "key", "value", "attn"):
        raise ValueError(f"unsupported facet {facet!r}")
    x = vit_mod._embed(qparams, cfg, images.astype(compute_dtype), precision)
    x = x.astype(compute_dtype)
    blocks = qparams["blocks"]

    def run(h, lo, hi):
        if hi <= lo:
            return h
        sl = {k: v[lo:hi] for k, v in blocks.items()}

        def body(h, bp):
            return _block_q(h, _cast_block(bp, compute_dtype), cfg), None

        h, _ = jax.lax.scan(body, h, sl, unroll=min(cfg.scan_unroll, hi - lo))
        return h

    if facet == "token":
        return run(x, 0, layer + 1)

    # qkv facets: run quantized blocks 0..layer-1, then recompute the qkv
    # projection of block `layer` with the int8 matmul — same semantics as
    # the reference's hook capture (dinov2_extractor.py:212-218) and
    # vit.vit_features' recompute path.
    x = run(x, 0, layer)
    bp = _cast_block({k: v[layer] for k, v in blocks.items()}, compute_dtype)
    x_norm = vit_mod._layernorm(x, bp["norm1_scale"], bp["norm1_bias"],
                                cfg.ln_eps, cfg.ln_f32)
    B, T, D = x_norm.shape
    h, hd = cfg.num_heads, cfg.head_dim
    qkv = _q_matmul(x_norm, bp["qkv_kernel"], bp["qkv_kernel_scale"][0],
                    bp["qkv_bias"], compute_dtype)
    qkv = qkv.reshape(B, T, 3, h, hd).transpose(2, 0, 3, 1, 4)  # (3, B, h, T, hd)
    if facet == "query":
        return qkv[0]
    if facet == "key":
        return qkv[1]
    if facet == "value":
        return qkv[2]
    q, k = qkv[0], qkv[1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        precision=precision).astype(jnp.float32)
    return jax.nn.softmax(logits / math.sqrt(hd), axis=-1)
