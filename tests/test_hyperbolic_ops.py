"""Property + golden tests for the hyperbolic math substrate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.hyperbolic import ops as H

C = 0.01


@pytest.fixture
def ball_points(rng):
    # interior points (radius << 1/sqrt(c)): near the boundary 1 - c||x||^2
    # cancels catastrophically in f32 — an inherent property of the
    # Poincaré<->Lorentz conversion, shared with the reference
    x = rng.normal(size=(64, 16)).astype(np.float32)
    return jnp.asarray(H.project_to_ball(jnp.asarray(x), C))


def test_project_to_ball_bounds(rng):
    x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32) * 100)
    p = H.project_to_ball(x, C)
    norms = np.linalg.norm(np.asarray(p), axis=-1)
    assert np.all(norms < 1.0 / np.sqrt(C))


def test_exp_log_inverse(rng):
    v = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32) * 0.5)
    x = H.exp_map_zero(v, C)
    v2 = H.log_map_zero(x, C)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-4, atol=1e-5)


def test_mobius_add_identity_and_inverse(ball_points):
    zero = jnp.zeros_like(ball_points)
    np.testing.assert_allclose(
        np.asarray(H.mobius_add(zero, ball_points, C)), np.asarray(ball_points),
        rtol=1e-4, atol=1e-5,
    )
    # x ⊕ (-x) = 0
    res = H.mobius_add(ball_points, -ball_points, C)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-4)


def test_distance_properties(ball_points):
    x, y = ball_points[:32], ball_points[32:]
    d_xy = np.asarray(H.hyperbolic_distance(x, y, C))
    d_yx = np.asarray(H.hyperbolic_distance(y, x, C))
    np.testing.assert_allclose(d_xy, d_yx, rtol=1e-3, atol=1e-4)  # symmetry
    d_xx = np.asarray(H.hyperbolic_distance(x, x, C))
    assert np.all(d_xx < 1e-2)  # ~0 (eps-clamped)
    assert np.all(d_xy >= 0)


def test_lorentz_roundtrip(ball_points):
    y = H.to_lorentz(ball_points, C)
    # on manifold: <y,y>_L = -1/c
    ip = np.asarray(H.lorentz_inner(y, y))
    np.testing.assert_allclose(ip, -1.0 / C, rtol=1e-3)
    back = H.to_poincare(y, C)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ball_points), rtol=1e-4, atol=1e-5)


def test_lorentz_distance_properties(ball_points):
    # NOTE: the reference's to_lorentz deliberately omits sqrt(c) on the
    # spatial part (ref:hyperbolic_ops.py:497 "no sqrt_c here"), so its
    # Lorentz distance is NOT numerically equal to the Poincaré distance;
    # we reproduce its exact conversion and check the properties it does
    # guarantee: symmetry, d(x,x)~0, and monotonicity with Poincaré d.
    x, y = ball_points[:32], ball_points[32:]
    xl, yl = H.to_lorentz(x, C), H.to_lorentz(y, C)
    d_xy = np.asarray(H.lorentz_distance(xl, yl, C))
    d_yx = np.asarray(H.lorentz_distance(yl, xl, C))
    np.testing.assert_allclose(d_xy, d_yx, rtol=1e-4)
    # Reference quirk reproduced faithfully: its distance formula
    # acosh(-alpha*sqrt(c))/sqrt(c) assumes <x,x>_L = -1/sqrt(c), but its
    # manifold normalisation enforces <x,x>_L = -1/c, so self-distance is
    # the constant acosh(1/sqrt(c))/sqrt(c) (~29.93 for c=0.01), not 0.
    d_xx = np.asarray(H.lorentz_distance(xl, xl, C))
    self_const = np.arccosh(1.0 / np.sqrt(C)) / np.sqrt(C)
    np.testing.assert_allclose(d_xx, self_const, rtol=1e-3)
    d_p = np.asarray(H.hyperbolic_distance(x, y, C))
    # larger Poincaré distance => larger Lorentz distance (high corr)
    rho = np.corrcoef(d_p, d_xy)[0, 1]
    assert rho > 0.95


def test_lorentz_centroid_segments_on_manifold(rng, ball_points):
    pts_l = H.to_lorentz(ball_points, C)
    seg = jnp.asarray(rng.integers(0, 5, 64).astype(np.int32))
    w = jnp.asarray(rng.uniform(0.1, 1.0, 64).astype(np.float32))
    cent = H.lorentz_centroid_segments(pts_l, w, seg, 6, C)
    ip = np.asarray(H.lorentz_inner(cent, cent))
    np.testing.assert_allclose(ip, -1.0 / C, rtol=1e-3)
    # segment 5 is empty -> origin
    np.testing.assert_allclose(np.asarray(cent[5]), [1.0 / np.sqrt(C)] + [0.0] * 16, atol=1e-5)


def test_lorentz_centroid_matches_reference_loop(rng, ball_points):
    """Vectorised centroid == per-node loop of the reference formula."""
    pts_l = np.asarray(H.to_lorentz(ball_points, C))
    seg = rng.integers(0, 4, 64)
    w = rng.uniform(0.1, 1.0, 64).astype(np.float32)
    cent = np.asarray(
        H.lorentz_centroid_segments(jnp.asarray(pts_l), jnp.asarray(w), jnp.asarray(seg), 4, C)
    )
    for s in range(4):
        m = seg == s
        ws = w[m] / (w[m].sum() + 1e-6)
        c_ref = (ws[:, None] * pts_l[m]).sum(0)
        ip = -(c_ref[0] * c_ref[0]) + (c_ref[1:] * c_ref[1:]).sum()
        c_ref = c_ref / np.sqrt(max(-ip * C, 1e-6))
        np.testing.assert_allclose(cent[s], c_ref, rtol=1e-4, atol=1e-5)


def test_einstein_midpoint_matches_reference_loop(rng, ball_points):
    pts = np.asarray(ball_points)
    seg = rng.integers(0, 4, 64)
    w = rng.uniform(0.1, 1.0, 64).astype(np.float32)
    mid = np.asarray(
        H.einstein_midpoint_segments(jnp.asarray(pts), jnp.asarray(w), jnp.asarray(seg), 4, C)
    )
    for s in range(4):
        m = seg == s
        ws = w[m] / (w[m].sum() + 1e-6)
        lam = 2.0 / (1.0 - C * (pts[m] ** 2).sum(-1) + 1e-6)
        ref = ((ws * lam)[:, None] * pts[m]).sum(0) / ((ws * lam).sum() + 1e-6)
        np.testing.assert_allclose(mid[s], ref, rtol=1e-4, atol=1e-5)


def test_apply_radius(ball_points):
    target = jnp.full((64,), 0.5)
    out = H.apply_radius(ball_points, target, C)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 0.5, rtol=1e-5)
    # direction preserved
    cos = np.sum(np.asarray(out) * np.asarray(ball_points), axis=-1)
    assert np.all(cos > 0)
