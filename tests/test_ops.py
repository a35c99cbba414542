"""Pallas kernel tests (interpret mode on CPU) vs XLA references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitvs_tpu.ops.attention import mha_attention
from vitvs_tpu.ops.matcher import dual_argmax_cosine

RNG = np.random.default_rng(31)


def _sdpa_ref(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@pytest.mark.parametrize("shape", [(1, 65, 2, 32), (2, 128, 3, 64)])
def test_pallas_attention_matches_sdpa(shape):
    B, T, H, D = shape
    q = jnp.asarray(RNG.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal(shape).astype(np.float32))
    ref = np.asarray(_sdpa_ref(q, k, v))
    out = np.asarray(mha_attention(q, k, v, q_tile=64, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [(1, 65, 2, 32), (2, 139, 3, 64)])
def test_fast_attention_matches_sdpa(shape):
    """No-max deferred-normalize serving kernel: equal to softmax up to the
    bf16 probability cast (and exercises the zero-pad denominator
    correction via T not multiple of 128)."""
    B, T, H, D = shape
    q = jnp.asarray(RNG.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal(shape).astype(np.float32))
    ref = np.asarray(_sdpa_ref(q, k, v))
    out = np.asarray(mha_attention(q, k, v, q_tile=64, interpret=True,
                                   fast=True))
    # f32 inputs: no-max exp + deferred normalize is mathematically
    # identical to softmax (bounded logits), so tolerance stays tight; the
    # bf16 probability cast only engages with bf16 inputs (TPU serving)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("t1,t2,d", [(100, 100, 96), (130, 70, 200)])
def test_pallas_matcher_matches_xla(t1, t2, d):
    a = jnp.asarray(RNG.standard_normal((t1, d)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((t2, d)).astype(np.float32))
    s1, n1, s2, n2 = dual_argmax_cosine(a, b, tile=64, d_tile=128, interpret=True)

    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    sim = np.asarray(an @ bn.T)
    np.testing.assert_allclose(np.asarray(s1), sim.max(1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n1), sim.argmax(1))
    np.testing.assert_allclose(np.asarray(s2), sim.max(0), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n2), sim.argmax(0))


def test_matcher_kernel_in_find_correspondences():
    """use_kernel path produces identical MatchResult off-TPU (fallback)."""
    from vitvs_tpu.match import find_correspondences

    a = jnp.asarray(RNG.standard_normal((49, 32)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((49, 32)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    r1 = find_correspondences(a, b, (7, 7), 8, key)
    r2 = find_correspondences(a, b, (7, 7), 8, key, use_kernel=True)
    np.testing.assert_array_equal(np.asarray(r1.points1), np.asarray(r2.points1))
    np.testing.assert_array_equal(np.asarray(r1.points2), np.asarray(r2.points2))
