"""Dense patch correspondence with cyclical-consistency filtering.

Rebuilds `chunk_cosine_sim` / `find_correspondences_batch` (reference
`catkin_ws/ibvs/src/vitvs_v2.py:49-155`) for XLA:

* The reference computes the all-pairs cosine similarity one row at a time in
  a Python loop; here it is ONE matmul over L2-normalized descriptors
  (optionally the fused Pallas kernel in :mod:`vitvs_tpu.ops.matcher`).
* The reference's data-dependent filtering (`mask = sorted_vals >= 1`,
  `torch.randperm`, possible `None` return) becomes a fixed-size top-k with a
  validity mask — static shapes, jit/vmap friendly; "no matches" is
  `num_valid == 0` instead of `None`.

Numerical parity notes (kept deliberately):
* The cyclical-distance normalization `(d - min) / (max(d - min) + 1e-8)`
  with threshold >= 1 selects, in float32, exactly the tokens achieving the
  maximum (usually perfect cycles) — vitvs_v2.py:123-131.  Perfect cycles
  (cyclical distance == 0) are ADDITIONALLY always eligible, which fixes two
  failure modes of the literal arithmetic (diagnosed r2 on a hardware sweep
  that aborted every episode 1-2 cm short of convergence):
  (a) TPU division is reciprocal-multiply, so `x / (x + 1e-8)` rounds to
      0.99999994 < 1 for non-power-of-two x — near the goal (small max cycle
      distance, e.g. sqrt(2)) NO token passes the >= 1 threshold even though
      hundreds of cycles are perfect.  torch/IEEE division returns exactly
      1.0 there, so this is TPU-parity restoration, not a departure;
  (b) when EVERY cycle is perfect (full mutual-NN bijection at near-goal
      views) the reference's dn is all-zero and selects nothing, tripping
      the feature-failure abort mid-convergence; the reference only escapes
      because pretrained DINOv2 similarity crosses the 0.99 same-image
      shortcut first.
  In every case where the literal arithmetic selects perfect cycles, the
  selection is identical.
* The same-image shortcut `mean(sim_1) > 0.99` (vitvs_v2.py:84) is a
  branch-free select here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MatchResult(NamedTuple):
    """Fixed-size correspondence set (k = num_pairs requested).

    points1/points2 are PATCH coordinates (row, col), float32; entries with
    valid == False are padding (clamped to index 0's coords) and must be
    masked downstream — mirroring where the reference returns fewer pairs or
    None (vitvs_v2.py:134-155).
    """

    points1: jnp.ndarray   # (k, 2) patch (row, col) in image 1 (goal)
    points2: jnp.ndarray   # (k, 2) patch (row, col) in image 2 (current)
    sim: jnp.ndarray       # (k,) cosine similarity of the selected pairs
    valid: jnp.ndarray     # (k,) bool
    num_valid: jnp.ndarray  # () int32
    same_image: jnp.ndarray  # () bool — the >0.99 mean-similarity shortcut


def cosine_similarity_matrix(
    desc1: jnp.ndarray, desc2: jnp.ndarray, precision=None, int8: bool = False
) -> jnp.ndarray:
    """(t1, d) x (t2, d) -> (t1, t2) cosine similarities (one MXU matmul).

    Norms accumulate in f32; the matmul runs in the descriptor dtype (bf16 on
    TPU — 2x MXU rate) with f32 accumulation, returning f32.  int8=True uses
    symmetric per-row dynamic quantization and an int8 MXU matmul (2x again);
    the per-row scales cancel in the cosine normalization, leaving only int8
    rounding error (~0.4% of the unit similarity scale — far below matching
    noise)."""

    from vitvs_tpu.match.binned import QuantizedBinned

    if isinstance(desc1, QuantizedBinned) or isinstance(desc2, QuantizedBinned):
        # source-quantized int8 binned descriptors (match/binned.py): all
        # per-row scales cancel in the cosine, leaving the int8 matmul and
        # the quantized-row norms
        assert isinstance(desc1, QuantizedBinned) and isinstance(desc2, QuantizedBinned)
        acc = jax.lax.dot_general(desc1.q, desc2.q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32)
                * jax.lax.rsqrt(desc1.nq + 1e-12)[:, None]
                * jax.lax.rsqrt(desc2.nq + 1e-12)[None, :])

    def _normalize(d):
        sq = jnp.sum(jnp.square(d.astype(jnp.float32)), -1, keepdims=True)
        return d * jax.lax.rsqrt(sq + 1e-24).astype(d.dtype)

    a = _normalize(desc1)
    b = _normalize(desc2)
    if int8:
        from vitvs_tpu.match.binned import quantize_rows_int8

        qa, sa = quantize_rows_int8(a)
        qb, sb = quantize_rows_int8(b)
        acc = jax.lax.dot_general(qa, qb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        # rows were unit-norm pre-quantization; rescale and renormalize the
        # residual norm error of the quantized rows
        sim = acc.astype(jnp.float32) * sa * sb.reshape(1, -1)
        na = jnp.sum((qa.astype(jnp.float32) * sa) ** 2, -1, keepdims=True)
        nb = jnp.sum((qb.astype(jnp.float32) * sb) ** 2, -1, keepdims=True)
        return sim * jax.lax.rsqrt(na + 1e-24) * jax.lax.rsqrt(nb.reshape(1, -1) + 1e-24)
    return jnp.einsum("td,sd->ts", a, b, precision=precision,
                      preferred_element_type=jnp.float32)


def _to_cartesian(idx: jnp.ndarray, width: int) -> jnp.ndarray:
    """Raveled patch index -> (row, col), the reference `_to_cartesian`
    (vitvs_v2.py:58-70)."""
    return jnp.stack([idx // width, idx % width], axis=-1)


def find_correspondences(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    num_patches: tuple[int, int],
    num_pairs: int,
    key: jax.Array,
    distance_threshold: float = 1.0,
    same_image_thresh: float = 0.99,
    sim_matrix: jnp.ndarray | None = None,
    precision=None,
    use_kernel: bool = False,
    int8: bool = False,
) -> MatchResult:
    """Mutual-NN correspondences via cyclical consistency.

    desc1, desc2: (t, d) dense patch descriptors (t = gh * gw row-major).
    Returns a fixed-size :class:`MatchResult` with `num_pairs` slots.

    use_kernel=True routes the similarity matmul + dual argmax through the
    fused Pallas kernel (ops/matcher.py) — the (t x t) matrix never leaves
    VMEM.  Off-TPU the kernel falls back to the XLA path automatically.
    """
    from vitvs_tpu.match.binned import QuantizedBinned

    gh, gw = num_patches
    t = (desc1.q if isinstance(desc1, QuantizedBinned) else desc1).shape[0]
    assert t == gh * gw

    if isinstance(desc1, QuantizedBinned):
        assert not use_kernel, "Pallas matcher takes raw descriptors"
    if use_kernel and int8:
        # the Pallas matcher computes an f32 matmul; silently serving it for
        # an int8-serving config would bench/validate the wrong arithmetic
        raise ValueError("use_kernel does not compose with int8 matching — "
                         "pick one (the int8 XLA matmul is the serving path)")
    if use_kernel and sim_matrix is None:
        from vitvs_tpu.ops.matcher import dual_argmax_cosine

        sim_1, nn_1, _, nn_2 = dual_argmax_cosine(desc1, desc2)
    else:
        sim = (cosine_similarity_matrix(desc1, desc2, precision, int8=int8)
               if sim_matrix is None else sim_matrix)
        sim = sim.astype(jnp.float32)
        sim_1 = jnp.max(sim, axis=1)          # best match quality per img1 token
        nn_1 = jnp.argmax(sim, axis=1)        # img1 -> img2
        nn_2 = jnp.argmax(sim, axis=0)        # img2 -> img1
    same_image = jnp.mean(sim_1) > same_image_thresh

    # Cyclical consistency: i -> nn_1[i] -> nn_2[nn_1[i]] should return to i.
    cyc = nn_2[nn_1]
    ij = _to_cartesian(jnp.arange(t), gw).astype(jnp.float32)
    cyc_ij = _to_cartesian(cyc, gw).astype(jnp.float32)
    d = -jnp.sqrt(jnp.sum(jnp.square(cyc_ij - ij), axis=-1))  # negative L2
    dn = d - jnp.min(d)
    dn = dn / (jnp.max(dn) + 1e-8)
    # float32-exact reference semantics, plus: perfect cycles stay eligible
    # in the all-perfect degenerate case (see module docstring)
    eligible = (dn >= distance_threshold) | (d == 0.0)

    # same-image shortcut: every token eligible, identity match, sim 1.0
    eligible = jnp.where(same_image, jnp.ones_like(eligible), eligible)

    # Uniform sample of `num_pairs` eligible tokens without replacement:
    # random scores, ineligible -> -inf, take top-k.
    scores = jax.random.uniform(key, (t,))
    scores = jnp.where(eligible, scores, -jnp.inf)
    k_eff = min(num_pairs, t)
    _, selected = jax.lax.top_k(scores, k_eff)
    if k_eff < num_pairs:  # more slots requested than tokens exist
        selected = jnp.pad(selected, (0, num_pairs - k_eff))
    num_eligible = jnp.sum(eligible.astype(jnp.int32))
    valid = jnp.arange(num_pairs) < jnp.minimum(num_eligible, k_eff)
    selected = jnp.where(valid, selected, 0)

    idx2 = jnp.where(same_image, selected, nn_1[selected])
    sim_sel = jnp.where(same_image, jnp.ones((num_pairs,), jnp.float32), sim_1[selected])

    return MatchResult(
        points1=_to_cartesian(selected, gw).astype(jnp.float32),
        points2=_to_cartesian(idx2, gw).astype(jnp.float32),
        sim=sim_sel,
        valid=valid,
        num_valid=jnp.minimum(num_eligible, num_pairs),
        same_image=same_image,
    )


def refine_matches_subpixel(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    match: MatchResult,
    num_patches: tuple[int, int],
    sim_matrix: jnp.ndarray | None = None,
) -> MatchResult:
    """Sub-patch refinement of the matched positions in image 2.

    `sim_matrix`: the (t, t) similarity the MATCH was made on, when one was
    materialized (the factorized fast-binned path).  The parabola fit's
    "center is the neighborhood max" premise only holds on that landscape —
    fitting raw-descriptor cosine around a binned-similarity argmax could
    land on a side lobe.  When None, the fit recomputes cosine from the
    given descriptors (correct for every path that matched on exactly
    those descriptors).

    The reference reports correspondences at PATCH CENTERS
    (`calculate_uv`, vitvs_v2.py:525-553), which quantizes the visual error
    to the patch pitch — at the benchmark operating point (308² input, 22×22
    grid, 0.8 m poster at 0.61 m height) one patch ≈ 2.2 cm on the poster.
    Failure clustering of the 500-episode standard sweep
    (scripts/diag_failures.py) shows exactly that floor: every failure is a
    near-miss (median lowest error 2.8 cm) on episodes whose small initial
    offset makes the 90%-reduction bar unreachable at patch quantization.

    This refinement is the standard 1-D parabola peak fit, per axis, of the
    cosine similarity between the goal token and the 3×3 patch neighborhood
    of its matched token in the current image.  Because the matched token is
    the row argmax, the center score is the neighborhood max and the fit is
    well-posed; offsets are clipped to ±0.5 patch and zeroed on grid borders,
    for invalid slots, and under the same-image shortcut.  Goal points stay
    at patch centers (they define the target features); only the current
    image's positions become continuous, which removes the quantization from
    the IBVS error signal e = s − s*.
    """
    from vitvs_tpu.match.binned import QuantizedBinned

    gh, gw = num_patches
    f32 = jnp.float32

    if isinstance(desc1, QuantizedBinned):
        # source-quantized serving path: gather the int8 rows — the per-row
        # unit normalization below cancels their quantization scales, so the
        # only difference from the bf16 path is the int8 rounding grid
        # (~0.8% of row amax per element, averaged out over the 9D-wide dot)
        desc1, desc2 = desc1.q, desc2.q

    def _unit_rows(x):
        x = x.astype(f32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    r1 = match.points1[:, 0].astype(jnp.int32)
    c1 = match.points1[:, 1].astype(jnp.int32)
    r2 = match.points2[:, 0].astype(jnp.int32)
    c2 = match.points2[:, 1].astype(jnp.int32)

    # 3x3 neighborhood indices around each matched token
    dr = jnp.array([-1, 0, 1], jnp.int32)
    rr = jnp.clip(r2[:, None] + dr[None, :], 0, gh - 1)        # (k, 3)
    cc = jnp.clip(c2[:, None] + dr[None, :], 0, gw - 1)        # (k, 3)
    nidx = rr[:, :, None] * gw + cc[:, None, :]                # (k, 3, 3)

    if sim_matrix is not None:
        # gather the neighborhood from the similarity the match used
        s = sim_matrix[(r1 * gw + c1)[:, None, None], nidx].astype(f32)
    else:
        # Gather FIRST, normalize after: only k goal rows and k*9
        # neighborhood rows are needed, so casting/normalizing the full
        # (t, d) tensors in f32 (2 x ~38 MB materialized at ViT-B@518
        # binned) would be pure HBM traffic in the serving hot loop.
        # Row-wise unit-normalization commutes with the row gather, so this
        # is the same cosine to f32 rounding.
        q = _unit_rows(desc1[r1 * gw + c1])       # (k, d) goal tokens
        nb = _unit_rows(desc2[nidx.reshape(-1)]).reshape(*nidx.shape, -1)
        s = jnp.einsum("kd,krcd->krc", q, nb)                  # (k, 3, 3)

    def _axis_offset(s_m, s0, s_p, at_border):
        den = s_m + s_p - 2.0 * s0          # < 0 at a genuine peak
        off = jnp.where(den < -1e-6, (s_m - s_p) / (2.0 * den), 0.0)
        off = jnp.clip(off, -0.5, 0.5)
        return jnp.where(at_border, 0.0, off)

    off_r = _axis_offset(s[:, 0, 1], s[:, 1, 1], s[:, 2, 1],
                         (r2 == 0) | (r2 == gh - 1))
    off_c = _axis_offset(s[:, 1, 0], s[:, 1, 1], s[:, 1, 2],
                         (c2 == 0) | (c2 == gw - 1))
    offs = jnp.stack([off_r, off_c], axis=-1)
    keep = match.valid & ~match.same_image
    offs = jnp.where(keep[:, None], offs, 0.0)
    return match._replace(points2=match.points2 + offs)


def match_points_to_pixels(
    points: jnp.ndarray,
    num_patches_side: int,
    dino_input_size: int,
    image_size_uv: tuple[int, int],
    round_px: bool = True,
) -> jnp.ndarray:
    """Patch (row, col) -> full-resolution pixel (u, v).

    Chains the reference's two scalings: patch -> DINO-input pixels
    `p * scale + scale/2` with scale = dino_input_size / num_patches
    (vitvs_v2.py:511-513), then flip (row,col)->(u,v) and rescale to the
    camera resolution with rounding (`calculate_uv`, vitvs_v2.py:525-553).
    round_px=False skips the final rounding — required to preserve
    sub-patch refined positions (:func:`refine_matches_subpixel`).
    """
    u_max, v_max = image_size_uv
    scale = dino_input_size / num_patches_side
    pix = points * scale + scale / 2.0          # (k, 2) = (y, x) in DINO input
    uv = jnp.stack([pix[..., 1], pix[..., 0]], axis=-1)  # flip -> (u, v)
    factors = jnp.array([u_max / dino_input_size, v_max / dino_input_size], jnp.float32)
    uv = uv * factors
    return jnp.round(uv) if round_px else uv
