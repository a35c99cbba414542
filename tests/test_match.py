"""Matcher tests vs a torch oracle of the reference matching semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from vitvs_tpu.match import correspondence as C

RNG = np.random.default_rng(11)


def torch_oracle_eligible(desc1: np.ndarray, desc2: np.ndarray, gw: int):
    """Oracle for the deterministic part of the reference matcher
    (vitvs_v2.py:78-131): returns (eligible_set, nn_1, sim_1, same_image)."""
    a = torch.from_numpy(desc1)
    b = torch.from_numpy(desc2)
    sim = torch.nn.functional.cosine_similarity(a[:, None, :], b[None, :, :], dim=-1)
    sim_1, nn_1 = sim.max(dim=1)
    _, nn_2 = sim.max(dim=0)
    same = sim_1.mean().item() > 0.99
    cyc = nn_2[nn_1]
    t = a.shape[0]
    idx = torch.arange(t)
    ij = torch.stack([idx // gw, idx % gw], -1).float()
    cij = torch.stack([cyc // gw, cyc % gw], -1).float()
    d = -torch.nn.PairwiseDistance(p=2)(cij, ij)
    dn = d - d.min()
    dn = dn / (dn.max() + 1e-8)
    eligible = set(torch.nonzero(dn >= 1.0).flatten().tolist())
    return eligible, nn_1.numpy(), sim_1.numpy(), same


def _random_descs(t, d, seed=0):
    r = np.random.default_rng(seed)
    return (r.standard_normal((t, d)).astype(np.float32),
            r.standard_normal((t, d)).astype(np.float32))


def test_cosine_matrix_matches_torch():
    d1, d2 = _random_descs(49, 32)
    ours = np.asarray(C.cosine_similarity_matrix(jnp.asarray(d1), jnp.asarray(d2),
                                                 precision="highest"))
    ref = torch.nn.functional.cosine_similarity(
        torch.from_numpy(d1)[:, None, :], torch.from_numpy(d2)[None, :, :], dim=-1
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_eligible_set_matches_oracle():
    gh = gw = 7
    d1, d2 = _random_descs(gh * gw, 48, seed=3)
    eligible_ref, nn1_ref, sim1_ref, same = torch_oracle_eligible(d1, d2, gw)
    assert not same
    res = C.find_correspondences(jnp.asarray(d1), jnp.asarray(d2), (gh, gw),
                                 num_pairs=64, key=jax.random.PRNGKey(0),
                                 precision="highest")
    # with num_pairs >= t, all eligible tokens must be selected
    got = set()
    pts = np.asarray(res.points1)
    val = np.asarray(res.valid)
    for i in range(64):
        if val[i]:
            got.add(int(pts[i, 0]) * gw + int(pts[i, 1]))
    assert got == eligible_ref
    assert int(res.num_valid) == len(eligible_ref)
    # mapping + sims agree with nn_1 / sim_1
    p2 = np.asarray(res.points2)
    sims = np.asarray(res.sim)
    for i in range(int(res.num_valid)):
        src = int(pts[i, 0]) * gw + int(pts[i, 1])
        dst = int(p2[i, 0]) * gw + int(p2[i, 1])
        assert dst == nn1_ref[src]
        assert abs(sims[i] - sim1_ref[src]) < 1e-5


def test_subsample_respects_num_pairs():
    gh = gw = 8
    d1, d2 = _random_descs(gh * gw, 24, seed=5)
    res = C.find_correspondences(jnp.asarray(d1), jnp.asarray(d2), (gh, gw),
                                 num_pairs=4, key=jax.random.PRNGKey(1),
                                 precision="highest")
    eligible_ref, nn1_ref, _, _ = torch_oracle_eligible(d1, d2, gw)
    assert np.asarray(res.valid).sum() == min(4, len(eligible_ref))
    pts = np.asarray(res.points1)
    for i in range(int(np.asarray(res.valid).sum())):
        assert int(pts[i, 0]) * gw + int(pts[i, 1]) in eligible_ref


def test_same_image_shortcut():
    gh = gw = 6
    d1, _ = _random_descs(gh * gw, 16, seed=7)
    res = C.find_correspondences(jnp.asarray(d1), jnp.asarray(d1), (gh, gw),
                                 num_pairs=10, key=jax.random.PRNGKey(2),
                                 precision="highest")
    assert bool(res.same_image)
    np.testing.assert_array_equal(np.asarray(res.points1), np.asarray(res.points2))
    np.testing.assert_allclose(np.asarray(res.sim), 1.0)
    assert int(res.num_valid) == 10


def test_degenerate_all_perfect_cycles_stays_matchable():
    """When every token has a perfect cycle (full mutual-NN bijection,
    near-goal views) the reference's dn = 0/(0+1e-8) = 0 < 1 selects NOTHING
    (vitvs_v2.py:123-131 returns None -> feature-failure abort mid-
    convergence).  Our matcher keeps perfect cycles eligible (module
    docstring): all t tokens match, identity mapping, so the servo can
    actually finish."""
    gh = gw = 4
    t = gh * gw
    # orthogonal basis descriptors: nn_1 = nn_2 = identity, mean sim << 0.99
    d1 = np.eye(t, dtype=np.float32)
    d2 = np.eye(t, dtype=np.float32) * 0.5 - 0.1
    eligible_ref, nn1_ref, _, same = torch_oracle_eligible(d1, d2, gw)
    assert not same and len(eligible_ref) == 0  # the reference degeneracy
    res = C.find_correspondences(jnp.asarray(d1), jnp.asarray(d2), (gh, gw),
                                 num_pairs=6, key=jax.random.PRNGKey(3),
                                 precision="highest")
    assert int(res.num_valid) == 6
    p1, p2 = np.asarray(res.points1), np.asarray(res.points2)
    for i in range(6):
        src = int(p1[i, 0]) * gw + int(p1[i, 1])
        assert int(p2[i, 0]) * gw + int(p2[i, 1]) == nn1_ref[src] == src


def test_perfect_cycles_eligible_is_noop_when_nondegenerate():
    """The `| (d == 0)` augmentation must not change selection whenever any
    imperfect cycle exists (perfect cycles already reach dn == 1 under IEEE
    division): random descriptors, jax vs torch oracle eligibility."""
    for seed in range(6):
        gh = gw = 7
        d1, d2 = _random_descs(gh * gw, 32, seed=100 + seed)
        eligible_ref, _, _, same = torch_oracle_eligible(d1, d2, gw)
        assert not same
        res = C.find_correspondences(jnp.asarray(d1), jnp.asarray(d2),
                                     (gh, gw), num_pairs=gh * gw,
                                     key=jax.random.PRNGKey(seed),
                                     precision="highest")
        got = {int(r) * gw + int(c)
               for (r, c), v in zip(np.asarray(res.points1),
                                    np.asarray(res.valid)) if v}
        assert got == eligible_ref


def test_match_points_to_pixels_reference_chain():
    """patch -> DINO pixels -> camera pixels, vitvs_v2.py:511-513,525-553."""
    pts = jnp.asarray([[0.0, 0.0], [10.0, 21.0]])
    out = np.asarray(C.match_points_to_pixels(pts, 22, 308, (640, 480)))
    scale = 308 / 22  # = 14
    # point (row=0,col=0) -> dino (7,7) -> u = 7*640/308, v = 7*480/308
    np.testing.assert_allclose(out[0], [round(7 * 640 / 308), round(7 * 480 / 308)])
    y, x = 10 * scale + 7, 21 * scale + 7
    np.testing.assert_allclose(out[1], [round(x * 640 / 308), round(y * 480 / 308)])


def test_vmap_batching():
    gh = gw = 5
    t = gh * gw
    d1 = RNG.standard_normal((3, t, 16)).astype(np.float32)
    d2 = RNG.standard_normal((3, t, 16)).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    fn = jax.vmap(lambda a, b, k: C.find_correspondences(a, b, (gh, gw), 8, k))
    res = fn(jnp.asarray(d1), jnp.asarray(d2), keys)
    assert res.points1.shape == (3, 8, 2)
    assert res.valid.shape == (3, 8)


def test_factorized_binned_similarity_matches_materialized():
    """match/binned.py shift identity == log_bin + cosine, exactly (up to
    float association)."""
    from vitvs_tpu.match.binned import binned_cosine_similarity
    from vitvs_tpu.models.extractor import log_bin

    gh, gw = 6, 5
    d1 = jnp.asarray(RNG.standard_normal((gh * gw, 24)).astype(np.float32))
    d2 = jnp.asarray(RNG.standard_normal((gh * gw, 24)).astype(np.float32))
    fast = np.asarray(binned_cosine_similarity(d1, d2, (gh, gw), precision="highest"))
    b1 = log_bin(d1[None], (gh, gw))[0]
    b2 = log_bin(d2[None], (gh, gw))[0]
    slow = np.asarray(C.cosine_similarity_matrix(b1, b2, precision="highest"))
    np.testing.assert_allclose(fast, slow, atol=2e-5)


def test_source_quantized_binned_matches_materialized_int8():
    """quantize_binned_int8 (the fused serving path: bin + normalize +
    quantize in one pass, no bf16 binned tensor) must reproduce the
    materialize-then-quantize int8 similarity: the quantization grid is
    scale-invariant under row normalization, so the values only differ by
    where the bf16 rounding lands."""
    from vitvs_tpu.match.binned import quantize_binned_int8
    from vitvs_tpu.models.extractor import log_bin

    gh, gw = 6, 5
    d1 = jnp.asarray(RNG.standard_normal((gh * gw, 24)).astype(np.float32))
    d2 = jnp.asarray(RNG.standard_normal((gh * gw, 24)).astype(np.float32))
    q1 = quantize_binned_int8(d1, (gh, gw))
    q2 = quantize_binned_int8(d2, (gh, gw))
    fused = np.asarray(C.cosine_similarity_matrix(q1, q2))

    b1 = log_bin(d1[None], (gh, gw))[0]
    b2 = log_bin(d2[None], (gh, gw))[0]
    mat = np.asarray(C.cosine_similarity_matrix(b1, b2, int8=True))
    np.testing.assert_allclose(fused, mat, atol=2e-3)
    assert (fused.argmax(1) == mat.argmax(1)).mean() > 0.96

    # the int8 values themselves match quantizing the materialized rows
    amax = np.max(np.abs(np.asarray(b2)), axis=-1, keepdims=True)
    expect = np.clip(np.round(np.asarray(b2) * (127.0 / amax)), -127, 127)
    np.testing.assert_array_equal(np.asarray(q2.q), expect.astype(np.int8))


def test_factorized_binned_int8_close():
    from vitvs_tpu.match.binned import binned_cosine_similarity

    gh, gw = 5, 5
    d1 = jnp.asarray(RNG.standard_normal((25, 32)).astype(np.float32))
    d2 = jnp.asarray(RNG.standard_normal((25, 32)).astype(np.float32))
    fp = np.asarray(binned_cosine_similarity(d1, d2, (gh, gw)))
    q = np.asarray(binned_cosine_similarity(d1, d2, (gh, gw), int8=True))
    assert np.abs(fp - q).max() < 0.01
    assert (fp.argmax(1) == q.argmax(1)).mean() > 0.95


def _smooth_field_descs(gh, gw, shift_rc, d=64, seed=3):
    """Descriptors sampled from a smooth random-Fourier field at patch
    centers; image 2 is the field translated by `shift_rc` patches."""
    r = np.random.default_rng(seed)
    W = r.standard_normal((2, d)).astype(np.float32) * 0.35  # low frequencies
    b = r.uniform(0, 2 * np.pi, d).astype(np.float32)

    def field(pos):  # pos (t, 2) float patch coords
        return np.cos(pos @ W + b).astype(np.float32)

    rr, cc = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    pos = np.stack([rr.ravel(), cc.ravel()], -1).astype(np.float32)
    desc1 = field(pos)
    # content of image2 at patch p is the image1 field at p - shift
    desc2 = field(pos - np.asarray(shift_rc, np.float32))
    return desc1, desc2


def test_subpixel_refinement_uses_matched_landscape_on_fast_binned_path():
    """With fast_binned_match the match argmax lives on the BINNED
    similarity; the refinement must fit the parabola on that same landscape
    (via sim_matrix), reproducing the materialized-binned path's offsets —
    not refit raw-descriptor cosine around a binned argmax."""
    from vitvs_tpu.match.binned import binned_cosine_similarity
    from vitvs_tpu.models.extractor import log_bin

    gh, gw = 6, 5
    t = gh * gw
    d1 = jnp.asarray(RNG.standard_normal((t, 24)).astype(np.float32))
    d2 = jnp.asarray(RNG.standard_normal((t, 24)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # fast path: match + refine on the factorized binned similarity
    sim = binned_cosine_similarity(d1, d2, (gh, gw), precision="highest")
    m_fast = C.find_correspondences(d1, d2, (gh, gw), 8, key, sim_matrix=sim)
    r_fast = C.refine_matches_subpixel(d1, d2, m_fast, (gh, gw),
                                       sim_matrix=sim)

    # reference path: materialized binned descriptors end-to-end
    b1 = log_bin(d1[None], (gh, gw))[0]
    b2 = log_bin(d2[None], (gh, gw))[0]
    m_mat = C.find_correspondences(b1, b2, (gh, gw), 8, key,
                                   precision="highest")
    r_mat = C.refine_matches_subpixel(b1, b2, m_mat, (gh, gw))

    np.testing.assert_array_equal(np.asarray(r_fast.valid),
                                  np.asarray(r_mat.valid))
    np.testing.assert_allclose(np.asarray(r_fast.points2),
                               np.asarray(r_mat.points2), atol=1e-3)


def test_subpixel_refinement_recovers_fractional_shift():
    """A sub-patch translation of a smooth field is recovered to <0.12 patch
    by the parabola refinement (patch-center matching alone errs ~|shift|)."""
    gh = gw = 12
    shift = (0.3, -0.4)
    desc1, desc2 = _smooth_field_descs(gh, gw, shift)
    m = C.find_correspondences(jnp.asarray(desc1), jnp.asarray(desc2),
                               (gh, gw), 24, jax.random.PRNGKey(0))
    refined = C.refine_matches_subpixel(jnp.asarray(desc1), jnp.asarray(desc2),
                                        m, (gh, gw))
    valid = np.asarray(m.valid)
    assert valid.sum() >= 8
    p1 = np.asarray(m.points1)[valid]
    p2r = np.asarray(refined.points2)[valid]
    # drop pairs whose matched token sits on the grid border (offset zeroed)
    inner = ((p1[:, 0] > 1) & (p1[:, 0] < gh - 2)
             & (p1[:, 1] > 1) & (p1[:, 1] < gw - 2))
    err = p2r[inner] - (p1[inner] + np.asarray(shift))
    # parabola fit on a cosine surface has a small curvature bias; bound the
    # worst case well under the 0.3/0.4-patch quantization error and the mean
    # at an order of magnitude better
    assert np.abs(err).max() < 0.2, err
    assert np.abs(err).mean() < 0.08, err
    # unrefined patch-center matching cannot do better than the rounded shift
    p2 = np.asarray(m.points2)[valid]
    quant_err = np.abs(p2[inner] - (p1[inner] + np.asarray(shift)))
    assert np.abs(err).max() < quant_err.max()


def test_subpixel_refinement_identity_cases():
    """Zero shift, same-image shortcut, and invalid slots stay unrefined."""
    gh = gw = 10
    desc1, desc2 = _smooth_field_descs(gh, gw, (0.0, 0.0), seed=5)
    m = C.find_correspondences(jnp.asarray(desc1), jnp.asarray(desc2),
                               (gh, gw), 16, jax.random.PRNGKey(1))
    refined = C.refine_matches_subpixel(jnp.asarray(desc1), jnp.asarray(desc2),
                                        m, (gh, gw))
    # identical images trip the same-image shortcut -> offsets forced to zero;
    # otherwise the symmetric peak gives near-zero offsets anyway
    np.testing.assert_allclose(np.asarray(refined.points2),
                               np.asarray(m.points2), atol=1e-5)
