"""Factorized log-binned similarity — binning without binned descriptors.

The hierarchy-1 log-binned descriptor (models/extractor.py:log_bin) is the
concatenation of 9 edge-clamped spatial shifts of the base features.  Its
dot product therefore FACTORIZES over the shifts:

    <binned_A[p], binned_B[q]>  =  sum_b  <A[sig_b(p)], B[sig_b(q)]>
                                =  sum_b  S0[sig_b(p), sig_b(q)]

where S0 = A B^T is the UNBINNED dot-product matrix and sig_b the clamped
2D shift of patch index by offset b.  Likewise the binned squared norm is
the shift-sum of unbinned squared norms.  So the full binned cosine matrix
costs ONE (t x t x d) matmul plus 9 cheap (t x t) gathers — a 9x FLOP
reduction over materializing 9d-wide descriptors and matching them (26 ->
2.9 GFLOP for ViT-B@518), and the 9d descriptor tensors never exist at all.

Exact identity with the materialized path up to float associativity
(tests/test_match.py::test_factorized_binned_similarity).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class QuantizedBinned(NamedTuple):
    """int8 hierarchy-1 log-binned descriptors, quantized at the source.

    `q` holds `round(binned_row * 127 / amax(binned_row))` — identical values
    to quantizing the materialized bf16 binned descriptors (the per-row
    normalization the cosine path applies first is scale-invariant, so it
    cancels out of the quantization grid).  `nq = sum(q^2)` per row: in the
    cosine similarity all per-row scales cancel, leaving
    `sim = (qa @ qb^T) * rsqrt(nqa) * rsqrt(nqb)` — the same arithmetic as
    correspondence.cosine_similarity_matrix(int8=True) after algebraic
    cancellation of its sa/sb factors.
    """

    q: jnp.ndarray    # (t, 9D) int8
    nq: jnp.ndarray   # (t,) float32  — sum of squared int8 values per row


def quantize_binned_int8(base: jnp.ndarray, grid: tuple[int, int]) -> QuantizedBinned:
    """UNBINNED (t, D) descriptors -> int8 binned descriptors, in ONE fused
    pass — the (t, 9D) bf16 binned tensor never materializes.

    Serving-path profile motivation (ViT-B@518, t=1369, 9D=6912): the
    materialize-then-quantize chain writes + re-reads ~19 MB of bf16 binned
    descriptors three times per frame (log_bin concat, cosine normalize,
    amax+quantize) — ~150 MB of pure HBM traffic.  Here the row amax
    factorizes over the 9 shifts (amax of a concat = max of the parts'
    amaxes), so the quantization scale comes from a 2 MB pass over the BASE
    descriptors, and each int8 output bin is `round(shifted_base * inv)`
    written directly.

    Bin order and edge-clamp semantics match extractor.log_bin (hierarchy 1)
    exactly; see `_shift_maps` for the index mapping.
    """
    t, D = base.shape
    gh, gw = grid
    assert t == gh * gw
    x = base.reshape(gh, gw, D)

    amax0 = jnp.max(jnp.abs(x), -1).astype(jnp.float32)      # (gh, gw)
    a_p = jnp.pad(amax0, ((1, 1), (1, 1)), mode="edge")
    amax9 = jnp.zeros((gh, gw), jnp.float32)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            amax9 = jnp.maximum(
                amax9, jax.lax.dynamic_slice(a_p, (dy, dx), (gh, gw)))
    inv = (127.0 / jnp.maximum(amax9, 1e-12)).astype(base.dtype)[..., None]

    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    parts = []
    for dy in (0, 1, 2):          # log_bin offset order: dy outer, dx inner
        for dx in (0, 1, 2):
            sl = jax.lax.dynamic_slice(xp, (dy, dx, 0), (gh, gw, D))
            parts.append(jnp.clip(jnp.round(sl * inv), -127, 127)
                         .astype(jnp.int8))
    q = jnp.concatenate(parts, axis=-1).reshape(t, 9 * D)
    nq = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)
    return QuantizedBinned(q=q, nq=nq)


def _shift_maps(grid: tuple[int, int]) -> np.ndarray:
    """(9, t) int32: clamped raveled index of each patch shifted by each of
    the 3x3 offsets (row-major offset order, matching log_bin)."""
    gh, gw = grid
    rows, cols = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    maps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            r = np.clip(rows + dy, 0, gh - 1)
            c = np.clip(cols + dx, 0, gw - 1)
            maps.append((r * gw + c).reshape(-1))
    return np.stack(maps).astype(np.int32)


def quantize_rows_int8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization on the amax/127 grid.

    THE one implementation of the match-path quantizer — the unbinned
    (correspondence.cosine_similarity_matrix) and factorized-binned paths
    promise identical arithmetic, which holds only while they share this
    exact grid (incl. the 1e-12 floor and the dtype of the inverse scale)."""
    amax = jnp.max(jnp.abs(x), -1, keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x * (1.0 / scale).astype(x.dtype)),
                 -127, 127).astype(jnp.int8)
    return q, scale


def binned_cosine_similarity(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    grid: tuple[int, int],
    precision=None,
    int8: bool = False,
) -> jnp.ndarray:
    """Cosine similarity of hierarchy-1 log-binned descriptors, computed
    from the UNBINNED (t, d) descriptors.  Returns (t, t) float32.

    (`_shift_maps` documents the index mapping this implements and is
    exercised by tests; the compute below uses edge padding + slices
    instead of gathers.)"""
    a32 = desc_a.astype(jnp.float32)
    b32 = desc_b.astype(jnp.float32)
    n0a = jnp.sum(a32 * a32, -1)            # (t,)
    n0b = jnp.sum(b32 * b32, -1)

    if int8:
        qa, sa = quantize_rows_int8(desc_a)
        qb, sb = quantize_rows_int8(desc_b)
        s0 = jax.lax.dot_general(qa, qb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        s0 = s0.astype(jnp.float32) * sa * sb.reshape(1, -1)
        dq_a = qa.astype(jnp.float32) * sa
        dq_b = qb.astype(jnp.float32) * sb
        n0a = jnp.sum(dq_a * dq_a, -1)
        n0b = jnp.sum(dq_b * dq_b, -1)
    else:
        s0 = jnp.einsum("td,sd->ts", desc_a, desc_b, precision=precision,
                        preferred_element_type=jnp.float32)

    # Shift-sum via edge padding + contiguous slices (arbitrary gathers along
    # the lane dimension are slow on TPU; slices are not).  Edge padding
    # reproduces the clamped indexing of log_bin exactly.
    gh, gw = grid
    s4 = s0.reshape(gh, gw, gh, gw)
    s4p = jnp.pad(s4, ((1, 1), (1, 1), (1, 1), (1, 1)), mode="edge")
    na4 = jnp.pad(n0a.reshape(gh, gw), ((1, 1), (1, 1)), mode="edge")
    nb4 = jnp.pad(n0b.reshape(gh, gw), ((1, 1), (1, 1)), mode="edge")

    s = jnp.zeros_like(s4)
    na = jnp.zeros((gh, gw), jnp.float32)
    nb = jnp.zeros((gh, gw), jnp.float32)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            s = s + jax.lax.dynamic_slice(s4p, (dy, dx, dy, dx), (gh, gw, gh, gw))
            na = na + jax.lax.dynamic_slice(na4, (dy, dx), (gh, gw))
            nb = nb + jax.lax.dynamic_slice(nb4, (dy, dx), (gh, gw))

    s = s.reshape(gh * gw, gh * gw)
    na = na.reshape(-1)
    nb = nb.reshape(-1)
    return s * jax.lax.rsqrt(na + 1e-24)[:, None] * jax.lax.rsqrt(nb + 1e-24)[None, :]
