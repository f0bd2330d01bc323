"""Tests for hyperbolic decoders, incl. the algebraic-fusion golden test:
the one-GEMM score matrix must equal the naive [B,N,d] Möbius expansion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.hyperbolic import decoders as D
from regcn_tpu.hyperbolic import ops as H

C = 0.01


@pytest.fixture
def setup(rng):
    n, r2, d, b = 50, 12, 16, 20
    ent = np.asarray(H.project_to_ball(jnp.asarray(
        rng.normal(size=(n, d)).astype(np.float32) * 2), C))
    rel = rng.normal(size=(r2, d)).astype(np.float32) * 0.5
    triples = np.stack(
        [rng.integers(0, n, b), rng.integers(0, r2, b), rng.integers(0, n, b)], 1
    ).astype(np.int32)
    return jnp.asarray(ent), jnp.asarray(rel), jnp.asarray(triples)


def _naive_dist_sq(query, cands, c):
    """Direct [B,N,d] expansion via mobius_add — the reference's semantics."""
    B, d = query.shape
    N = cands.shape[0]
    q = jnp.broadcast_to(query[:, None, :], (B, N, d)).reshape(-1, d)
    x = jnp.broadcast_to(cands[None, :, :], (B, N, d)).reshape(-1, d)
    diff = H.mobius_add(-q, x, c)
    return jnp.sum(diff**2, axis=-1).reshape(B, N)


def test_algebraic_score_matches_naive_expansion(setup):
    ent, rel, triples = setup
    query = ent[triples[:, 0]]  # arbitrary ball points as queries
    naive = D.SCORE_EPS  # noqa: F841
    expected = 1.0 - np.asarray(_naive_dist_sq(query, ent, C))
    got = np.asarray(D.dist_score(query, ent, C, score_margin=1.0))
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


def test_ce_loss_matches_full_softmax(setup):
    ent, rel, triples = setup
    query = ent[triples[:, 0]]
    target = triples[:, 2]
    bias = jnp.asarray(np.random.default_rng(1).normal(size=(ent.shape[0],)).astype(np.float32))
    loss = D.dist_ce_loss(query, ent, target, C, candidate_bias=bias,
                          score_scale=jnp.asarray(1.3), score_margin=jnp.asarray(0.7))
    logits = D.dist_score(query, ent, C, candidate_bias=bias,
                          score_scale=jnp.asarray(1.3), score_margin=jnp.asarray(0.7))
    expected = -jnp.take_along_axis(logits, target[:, None], 1)[:, 0] + jax.nn.logsumexp(logits, 1)
    np.testing.assert_allclose(float(loss), float(expected.mean()), rtol=1e-5)


def test_givens_rotation_is_isometry(rng):
    x = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    angles = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    y = D.givens_rotation(x, angles)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
    )
    # zero angles = identity
    np.testing.assert_allclose(
        np.asarray(D.givens_rotation(x, jnp.zeros((8, 5)))), np.asarray(x), rtol=1e-6
    )


def test_givens_reflection_involution(rng):
    x = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    angles = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    y = D.givens_reflection(D.givens_reflection(x, angles), angles)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_bias,use_relc", [(False, False), (True, True)])
def test_murp_roth_atth_shapes_and_grads(setup, use_bias, use_relc):
    ent, rel, triples = setup
    n, d = ent.shape
    r2 = rel.shape[0]
    key = jax.random.PRNGKey(0)
    for init_fn, score_fn, loss_fn in (
        (D.init_murp, D.murp_score, D.murp_loss),
        (D.init_roth, D.roth_score, D.roth_loss),
        (D.init_atth, D.atth_score, D.atth_loss),
    ):
        params = init_fn(key, n, r2, d, use_entity_bias=use_bias, use_rel_curvature=use_relc)
        scores = score_fn(params, ent, rel, triples, C)
        assert scores.shape == (len(triples), n)
        assert np.all(np.isfinite(np.asarray(scores)))
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, ent, rel, triples, C)
        )(params)
        assert np.isfinite(float(loss))
        gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
        assert gnorm > 0  # gradients flow


def test_rel_decoders_shapes(setup):
    ent, rel, triples = setup
    d = ent.shape[1]
    r_base = rel.shape[0] // 2
    key = jax.random.PRNGKey(1)
    for init_fn, score_fn in (
        (D.init_murp_rel, D.murp_rel_score),
        (D.init_roth_rel, D.roth_rel_score),
        (D.init_atth_rel, D.atth_rel_score),
    ):
        params = init_fn(key, r_base, d)
        scores = score_fn(params, ent, rel, triples, C)
        assert scores.shape == (len(triples), 2 * r_base)
        assert np.all(np.isfinite(np.asarray(scores)))


def test_tangent_heads(setup):
    ent, rel, triples = setup
    s1 = D.distmult_score(ent, rel, triples, C)
    s2 = D.complex_score(ent, rel, triples, C)
    assert s1.shape == s2.shape == (len(triples), ent.shape[0])


def test_hyperbolic_convtranse(setup):
    ent, rel, triples = setup
    n, d = ent.shape
    params, bn = D.init_hyperbolic_convtranse(jax.random.PRNGKey(2), n, d, channels=4)
    scores, _ = D.hyperbolic_convtranse_score(
        params, bn, ent, rel, triples, C, mask=jnp.ones(len(triples))
    )
    assert scores.shape == (len(triples), n)
    paramsr, bnr = D.init_hyperbolic_convtransr(jax.random.PRNGKey(3), rel.shape[0], d, channels=4)
    scores_r, _ = D.hyperbolic_convtransr_score(
        paramsr, bnr, ent, rel, triples, C, mask=jnp.ones(len(triples))
    )
    assert scores_r.shape == (len(triples), rel.shape[0])
