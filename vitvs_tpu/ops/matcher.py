"""Fused cosine-similarity mutual-argmax Pallas kernel.

The matcher needs, from the (t1 x t2) cosine-similarity matrix, only four
vectors: per-row max/argmax (img1 -> img2 nearest neighbours) and per-column
max/argmax (img2 -> img1).  The reference materializes the full matrix
(`chunk_cosine_sim`, vitvs_v2.py:49-56) — with binned descriptors that is a
(t x t x 9d)-FLOP matmul whose (t x t) output then round-trips HBM.

This kernel tiles the matmul and reduces rows AND columns on the fly, so the
similarity matrix never leaves VMEM:

* grid = (row_tiles, d_tiles), d innermost; per row tile the FULL column
  range of desc2 is resident (ViT-VS token counts are <= ~1.4k, so a
  (t2_pad x d_tile) slab fits VMEM);
* partial dot products accumulate over d tiles in an f32 scratch;
* row max/argmax are written per row tile (consecutive output blocks);
* column max/argmax accumulate in SCRATCH (scratch persists across the
  sequential TPU grid) and are flushed on the last grid step.

Descriptor L2 norms are folded in via inverse-norm vectors computed by one
cheap fused XLA reduction outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # python float: jnp constants would be captured by the kernel


from vitvs_tpu.ops.tiling import round_up as _round_up


def _matcher_kernel(a_ref, b_ref, ainv_ref, binv_ref,
                    rmax_ref, rarg_ref, cmax_ref, carg_ref,
                    acc_ref, cmax_s, carg_s,
                    *, t1: int, t2: int, tile: int):
    i = pl.program_id(0)
    kd = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_d = pl.num_programs(1)

    @pl.when((i == 0) & (kd == 0))
    def _():
        cmax_s[:] = jnp.full_like(cmax_s, _NEG)
        carg_s[:] = jnp.zeros_like(carg_s)

    @pl.when(kd == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kd == n_d - 1)
    def _finalize():
        sim = acc_ref[:] * ainv_ref[:] * binv_ref[:].reshape(1, -1)  # (tile, t2p)
        rows = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0) + i * tile
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        sim = jnp.where((rows < t1) & (cols < t2), sim, _NEG)

        # row reduction: final for this row tile
        rmax_ref[0] = jnp.max(sim, axis=1)
        rarg_ref[0] = jnp.argmax(sim, axis=1).astype(jnp.int32)

        # column reduction: accumulate into scratch across row tiles
        tile_cmax = jnp.max(sim, axis=0)
        tile_carg = (jnp.argmax(sim, axis=0) + i * tile).astype(jnp.int32)
        better = tile_cmax > cmax_s[0]
        cmax_s[0] = jnp.where(better, tile_cmax, cmax_s[0])
        carg_s[0] = jnp.where(better, tile_carg, carg_s[0])

        @pl.when(i == n_i - 1)
        def _():
            cmax_ref[:] = cmax_s[:]
            carg_ref[:] = carg_s[:]


@functools.partial(jax.jit, static_argnames=("tile", "d_tile", "interpret"))
def dual_argmax_cosine(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    tile: int = 256,
    d_tile: int = 512,
    interpret: bool = False,
):
    """Row and column nearest neighbours of the cosine-similarity matrix.

    desc1: (t1, d), desc2: (t2, d).
    Returns (sim_1 (t1,), nn_1 (t1,) int32, sim_2 (t2,), nn_2 (t2,) int32)
    — exactly the `sim.max(-1) / argmax(-1) / max(-2) / argmax(-2)` quartet
    the reference extracts (vitvs_v2.py:80-81).
    """
    t1, d = desc1.shape
    t2, _ = desc2.shape

    if jax.default_backend() != "tpu" and not interpret:
        a = desc1 * jax.lax.rsqrt(jnp.sum(desc1 * desc1, -1, keepdims=True) + 1e-24)
        b = desc2 * jax.lax.rsqrt(jnp.sum(desc2 * desc2, -1, keepdims=True) + 1e-24)
        sim = a @ b.T
        return (jnp.max(sim, 1), jnp.argmax(sim, 1).astype(jnp.int32),
                jnp.max(sim, 0), jnp.argmax(sim, 0).astype(jnp.int32))

    dp = _round_up(d, d_tile)
    t1p = _round_up(t1, tile)
    t2p = _round_up(t2, 128)
    a = jnp.pad(desc1.astype(jnp.float32), ((0, t1p - t1), (0, dp - d)))
    b = jnp.pad(desc2.astype(jnp.float32), ((0, t2p - t2), (0, dp - d)))
    ainv = jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-24)  # (t1p, 1)
    binv = jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-24)  # (t2p, 1)

    n_i, n_d = t1p // tile, dp // d_tile

    rmax, rarg, cmax, carg = pl.pallas_call(
        functools.partial(_matcher_kernel, t1=t1, t2=t2, tile=tile),
        grid=(n_i, n_d),
        in_specs=[
            pl.BlockSpec((tile, d_tile), lambda i, kd: (i, kd), memory_space=pltpu.VMEM),
            pl.BlockSpec((t2p, d_tile), lambda i, kd: (0, kd), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, kd: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t2p, 1), lambda i, kd: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i, kd: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, kd: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t2p), lambda i, kd: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t2p), lambda i, kd: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, t1p), jnp.float32),
            jax.ShapeDtypeStruct((1, t1p), jnp.int32),
            jax.ShapeDtypeStruct((1, t2p), jnp.float32),
            jax.ShapeDtypeStruct((1, t2p), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, t2p), jnp.float32),
            pltpu.VMEM((1, t2p), jnp.float32),
            pltpu.VMEM((1, t2p), jnp.int32),
        ],
        interpret=interpret,
    )(a, b, ainv, binv)

    return rmax[0, :t1], rarg[0, :t1], cmax[0, :t2], carg[0, :t2]
