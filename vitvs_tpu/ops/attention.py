"""Pallas TPU attention kernel for the ViT.

Replaces the torch SDPA call of the reference's vendored DINOv2 attention
(`dino_patch/attention.py:70-80`).  ViT-VS sequence lengths are short
(485 tokens at 308^2, 1370 at 518^2, SURVEY §5.7), so the full K/V for one
(batch, head) fits comfortably in VMEM: the kernel is a single-pass
block-softmax — per Q tile, S = Q K^T is computed, softmaxed and applied to
V entirely on-chip, so the (T x T) score matrix never touches HBM.

Why this beats XLA's fused attention at these shapes (profiled r2): XLA
materializes the full f32 probability tensor (12 x 1370 x 1370 = 90 MB) to
memory every forward (~0.8 ms of the 2.5 ms servo step); here each Q tile's
scores live only in VMEM.  Design notes:

* head_dim stays 64 — no padding to 128 (the r1 kernel padded and paid 2x
  matmul FLOPs and VMEM);
* the softmax scale is folded into Q before the kernel (T x 64 multiply
  instead of T x T);
* the softmax divide is a per-row reciprocal + broadcast multiply, not an
  elementwise divide over the score tile;
* K/V blocks are grid-invariant across Q tiles, so Pallas keeps them
  resident in VMEM per (batch, head).

Falls back to a pure-XLA implementation off-TPU (and under
``interpret=True`` in tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from vitvs_tpu.ops.tiling import round_up as _round_up


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int):
    """One (batch*head, q_tile) program: softmax(Q K^T) V with the score
    tile resident in VMEM.  Q arrives pre-scaled by head_dim^-0.5."""
    q = q_ref[0]                       # (TQ, D) bf16
    k = k_ref[0]                       # (TK_pad, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # (TQ, TK_pad) f32, VMEM only
    if s.shape[-1] != t_real:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_real, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)   # (TQ, 1) divides only
    p = (e * inv).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _fast_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int):
    """No-max, deferred-normalize softmax attention (serving mode).

    Measured r2 (interleaved A/B in the int8 ViT-B@518 servo step): 2.78 vs
    XLA's 2.56 ms/iter — pallas_call layout/grid overhead at head_dim 64
    outweighs the saved VPU passes, so this stays OPT-IN and XLA remains the
    serving default; it is the fallback for hardware where XLA materializes
    the probs tensor to HBM (v5e keeps it VMEM-resident).

    Requires bounded logits (|s| < ~80 after scaling) — guaranteed for LN'd
    ViT activations (calibrated max |logit| ~15-30); exp(s) cannot overflow
    f32.  VPU cost per score tile is ONE exp pass + one sum reduction
    (standard softmax needs max-reduce, subtract, exp, sum, divide):

    * no max subtraction;
    * padded K columns are zeroed out of the exp tile with an iota select
      (r2 subtracted the constant `n_pad` from the denominator instead —
      cheaper, but when a row's real exp-sum is small relative to n_pad
      (all real logits strongly negative) the subtraction cancels
      catastrophically in f32 and the row normalizes to inf/NaN; the mask
      costs one select pass only when padding exists);
    * normalization is applied to the (TQ, D) output rows instead of the
      (TQ, TK) probability tile (21x fewer elements at D=64, T=1370).
    """
    q = q_ref[0]                       # (TQ, D) bf16, pre-scaled
    k = k_ref[0]                       # (TK_pad, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # (TQ, TK_pad) f32, VMEM only
    # q arrives pre-scaled by log2(e) as well, so exp(s_raw) == exp2(s):
    # VPU exp is exp2(x * log2e) — folding the multiply into the (TQ, D)
    # Q scale removes a full pass over the (TQ, TK) tile
    e = jnp.exp2(s)
    if s.shape[-1] != t_real:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        e = jnp.where(col < t_real, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)  # (TQ, 1)
    num = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # (TQ, D) f32
    o_ref[0] = (num * (1.0 / denom)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret", "fast"))
def mha_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 512,
    interpret: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """Multi-head attention, (B, T, h, d) layout -> (B, T, h, d).

    Scale is d^-0.5, matching torch SDPA defaults.  fast=True uses the
    no-max deferred-normalize kernel (serving mode, bounded logits — see
    `_fast_kernel`); numerically equal to softmax up to bf16 probability
    rounding.
    """
    B, T, H, D = q.shape
    scale = 1.0 / math.sqrt(D)

    if jax.default_backend() != "tpu" and not interpret:
        # XLA fallback (CPU tests, non-TPU runs)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    q_tile = min(q_tile, _round_up(T, 8))
    tq_pad = _round_up(T, q_tile)
    tk_pad = _round_up(T, 128)

    def prep(x, t_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, T, D)
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0)))

    qp = prep(q * (scale * math.log2(math.e) if fast else scale), tq_pad)
    kp = prep(k, tk_pad)
    vp = prep(v, tk_pad)
    n_q = tq_pad // q_tile

    kernel = functools.partial(_fast_kernel if fast else _flash_kernel,
                               t_real=T)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, n_q),
        in_specs=[
            pl.BlockSpec((1, q_tile, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, D), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :T].reshape(B, H, T, D)
    return jnp.transpose(out, (0, 2, 1, 3))
