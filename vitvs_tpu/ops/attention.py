"""Pallas TPU attention kernel for the ViT.

Replaces the torch SDPA call of the reference's vendored DINOv2 attention
(`dino_patch/attention.py:70-80`).  ViT-VS sequence lengths are short
(485 tokens at 308^2, 1370 at 518^2, SURVEY §5.7), so the full K/V for one
(batch, head) fits comfortably in VMEM: the kernel is a single-pass
block-softmax — per Q tile, S = Q K^T is computed, softmaxed and applied to
V entirely on-chip, so the (T x T) score matrix never touches HBM.

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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    """One (batch*head, q_tile) program: full softmax against all keys."""
    q = q_ref[0]                       # (TQ, D)
    k = k_ref[0]                       # (T_pad, D)
    v = v_ref[0]                       # (T_pad, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (TQ, T_pad) f32
    t_pad = s.shape[-1]
    if t_pad != t_real:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_real, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret"))
def mha_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention, (B, T, h, d) layout -> (B, T, h, d).

    Scale is d^-0.5, matching torch SDPA defaults.
    """
    B, T, H, D = q.shape
    scale = 1.0 / math.sqrt(D)

    if jax.default_backend() != "tpu" and not interpret:
        # XLA fallback (CPU tests, non-TPU runs)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    t_pad = _round_up(T, q_tile)
    d_pad = _round_up(D, 128)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, T, D)
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, d_pad - D)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    n_q = t_pad // q_tile

    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_real=T, scale=scale),
        grid=(B * H, n_q),
        in_specs=[
            pl.BlockSpec((1, q_tile, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :T, :D].reshape(B, H, T, D)
    return jnp.transpose(out, (0, 2, 1, 3))
