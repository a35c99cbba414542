"""Fused int8-QK^T attention kernel (serving path).

The r2 measurement campaign (README ledger) established that on v5e, XLA's
fused bf16 attention is near its bound (~65 us/block for ViT-B@518: QK^T at
half MXU utilization because head_dim=64 halves the 128-deep contraction,
plus a 5-pass f32 softmax), and that neither the pure-Pallas bf16 kernels
(`ops/attention.py` — lost to host-side layout transposes + grid overhead)
nor XLA-level int8 score matmuls (`models/quant.py` quant_attn='qk+pv' —
lost to extra HBM quantize passes over the (T x T) tensors) beat it.  This
kernel is the remaining lever the r2 verdict names: int8 QK^T with
in-register dequantization inside ONE fused kernel, where the (T x T) score
tile never leaves VMEM.

Design (all three r2 failure modes addressed):

* **No layout changes.**  Q, K, V enter and leave in the ViT's natural
  (B, T, H*hd) layout — contiguous slices of the qkv projection output.
  Heads are looped INSIDE the kernel over 64-lane column slices; there is
  no (B, h, T, d) transpose on either side of the pallas_call (the r1/r2
  kernels' prep/unprep transposes cost more than their VMEM savings).
* **Quantization is fused into the producer.**  Q/K are quantized to int8
  per (token, head) by XLA *outside* the kernel — a max-reduce over 64
  lanes that fuses into the qkv matmul epilogue; only int8 activations and
  (T, heads) f32 scale tensors cross HBM (halving attention input traffic).
  The softmax scale (hd^-0.5) and the exp2 conversion constant log2(e) are
  folded into the Q scales, so dequantization inside the kernel is a single
  fused multiply-add per score tile:  S = (acc_i32 * qs_col) * ks_row + bias.
* **No-max exp2 softmax.**  LayerNormed ViT logits are bounded (|logit|
  <= ~30 calibrated, far under exp2's f32 range), so the max-subtraction
  pass is dropped (`ops/attention._fast_kernel` rationale); padded K
  columns are killed by a -1e30 additive bias row folded into the dequant
  FMA — zero extra VPU passes for masking.
* P@V stays bf16 (full-depth T contraction already runs the MXU at full
  tile depth; int8 probs would need a per-row max pass, re-adding the
  reduction the no-max softmax deletes).

Per-block VPU work on the (TQ, TK) tile: dequant FMA + exp2 + row-sum
(vs XLA's scale/max/sub-exp/sum/div), and the QK^T matmul runs at the MXU's
doubled int8 rate.  Numerics: per-(token, head) symmetric int8 on Q/K gives
~0.5% logit error — comparable to bf16 probability rounding, and this is
the *quantized serving* path whose matcher tolerance is validated end to
end (tests/test_quant.py, scripts/revalidate_int8.py).

Falls back to an equivalent XLA implementation off-TPU; `interpret=True`
runs the real kernel on CPU for tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


from vitvs_tpu.ops.tiling import round_up as _round_up


def _quant_th(x: jnp.ndarray, heads: int, extra_scale: float = 1.0):
    """(B, T, H*hd) -> int8 values (B, T, H*hd) + f32 scales (B, T, H).

    Symmetric per-(token, head) quantization.  `extra_scale` is folded into
    the returned scales (NOT into the int8 values), so callers can carry the
    softmax scale and log2(e) for free."""
    B, T, D = x.shape
    hd = D // heads
    xh = x.reshape(B, T, heads, hd)
    amax = jnp.max(jnp.abs(xh), axis=-1).astype(jnp.float32)   # (B, T, H)
    s = jnp.maximum(amax, 1e-12) / 127.0
    inv = (1.0 / s).astype(x.dtype)
    q = jnp.clip(jnp.round(xh * inv[..., None]), -127, 127)
    return q.astype(jnp.int8).reshape(B, T, D), s * extra_scale


def _kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, bias_ref, o_ref,
            *, heads: int, hd: int):
    """One (batch, q_tile) program: all heads, scores resident in VMEM.

    q_ref (1, TQ, H*hd) int8; k_ref (1, TK, H*hd) int8; v_ref same in bf16;
    qs_ref (1, TQ, H) f32 (pre-folded with hd^-0.5 * log2(e));
    ks_ref (1, H, TK) f32 (pre-transposed on host: lane dim = keys);
    bias_ref (1, 1, TK) f32 (0 real / -1e30 padded columns)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]                                   # (1, TK)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        acc = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                # (TQ, TK) int32
        qs = qs_ref[0][:, h:h + 1]                       # (TQ, 1)
        ks = ks_ref[0][h:h + 1, :]                       # (1, TK)
        s = (acc.astype(jnp.float32) * qs) * ks + bias   # fused dequant+mask
        e = jnp.exp2(s)                                  # no-max (bounded)
        denom = jnp.sum(e, axis=-1, keepdims=True)       # (TQ, 1)
        num = jax.lax.dot_general(
            e.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (TQ, hd)
        o_ref[0, :, sl] = (num * (1.0 / denom)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "q_tile", "interpret", "force"))
def fused_int8_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    q_tile: int = 512,
    interpret: bool = False,
    force: bool = False,
) -> jnp.ndarray:
    """softmax(Q K^T / sqrt(hd)) V with int8 QK^T, natural (B, T, H*hd) layout.

    q/k/v: contiguous slices of the qkv projection output (bias added),
    head-major column order ([h0 | h1 | ...] x 64 lanes each).  Returns the
    attention output in the same layout/dtype as q.  Off-TPU (unless
    `interpret` or `force`) falls back to XLA softmax attention — exact, not
    quantized — for correctness-only paths."""
    B, T, D = q.shape
    hd = D // heads
    if jax.default_backend() != "tpu" and not (interpret or force):
        qh = q.reshape(B, T, heads, hd)
        kh = k.reshape(B, T, heads, hd)
        vh = v.reshape(B, T, heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
        p = jax.nn.softmax(logits / math.sqrt(hd), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, T, D)

    # fold softmax scale + exp2 conversion into the Q scales
    q_i8, qs = _quant_th(q, heads, extra_scale=math.log2(math.e) / math.sqrt(hd))
    k_i8, ks = _quant_th(k, heads)

    q_tile = min(q_tile, _round_up(T, 8))
    tq_pad = _round_up(T, q_tile)
    tk_pad = _round_up(T, 128)

    def pad_t(x, t_pad):
        return jnp.pad(x, ((0, 0), (0, t_pad - T)) + ((0, 0),) * (x.ndim - 2))

    q_i8 = pad_t(q_i8, tq_pad)
    qs = pad_t(qs, tq_pad)
    k_i8 = pad_t(k_i8, tk_pad)
    vp = pad_t(v, tk_pad)
    ks_row = pad_t(ks, tk_pad).transpose(0, 2, 1)        # (B, H, TK) f32
    col = jnp.arange(tk_pad)
    bias = jnp.where(col < T, 0.0, _NEG).astype(jnp.float32)[None, None, :]
    bias = jnp.broadcast_to(bias, (B, 1, tk_pad))

    n_q = tq_pad // q_tile
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, hd=hd),
        grid=(B, n_q),
        in_specs=[
            pl.BlockSpec((1, q_tile, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, heads), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, tk_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, tq_pad, D), q.dtype),
        interpret=interpret,
    )(q_i8, k_i8, vp, qs, ks_row, bias)
    return out[:, :T]
