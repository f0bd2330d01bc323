"""Tests for the four hyperbolic GNN encoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.data import build_snapshot
from regcn_tpu.hyperbolic import layers as L
from regcn_tpu.hyperbolic import ops as H

C = 0.01


@pytest.fixture
def graph_setup(rng, tiny_graph):
    n, r, triples = tiny_graph
    d = 16
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    h = jnp.asarray(H.exp_map_zero(
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) * 0.1), C))
    rel = jnp.asarray(rng.normal(size=(2 * r, d)).astype(np.float32) * 0.1)
    return n, r, d, snap, h, rel


@pytest.mark.parametrize("encoder", L.ENCODERS)
def test_encoder_outputs_in_ball_and_differentiable(graph_setup, encoder):
    n, r, d, snap, h, rel = graph_setup
    params = L.init_encoder_cell(
        jax.random.PRNGKey(0), encoder, d, 2 * r, n_layers=2, n_bases=4,
        num_heads=4, self_loop=True,
    )
    out = L.encoder_cell(params, encoder, h, rel, snap, C, n_bases=4)
    assert out.shape == (n, d)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert np.all(norms < 1.0 / np.sqrt(C)), f"{encoder} escaped the ball"
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        o = L.encoder_cell(p, encoder, h, rel, snap, C, n_bases=4)
        return jnp.sum(H.log_map_zero(o, C) ** 2)

    grads = jax.grad(loss)(params)
    gn = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0, f"{encoder} gradient dead or NaN"


@pytest.mark.parametrize("encoder", L.ENCODERS)
def test_encoder_cell_preserves_bfloat16(graph_setup, encoder):
    """Regression: every encoder cell must be dtype-preserving under
    compute_dtype=bfloat16 (fp32 islands inside, input dtype out) — a
    f32 output breaks the fused-epoch scan carry. Before round 4 this
    held only for hyperbolic_uvrgcn: the Einstein-midpoint / Lorentz-
    centroid aggregations upcast through their fp32 weights, so bf16
    training CRASHED for fhnn/lgcn/hgat."""
    n, r, d, snap, h, rel = graph_setup
    params = L.init_encoder_cell(
        jax.random.PRNGKey(0), encoder, d, 2 * r, n_layers=2, n_bases=4,
        num_heads=4, self_loop=True,
    )
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    out = L.encoder_cell(params, encoder, h.astype(jnp.bfloat16),
                         rel.astype(jnp.bfloat16), snap, C, n_bases=4)
    assert out.dtype == jnp.bfloat16, f"{encoder} upcast to {out.dtype}"
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


def test_union_layer_padding_invariance(graph_setup):
    """Extra padded edges must not change the output."""
    n, r, d, snap, h, rel = graph_setup
    from regcn_tpu.data import build_snapshot as bs
    import numpy as _np

    params = L.init_hyperbolic_union_layer(jax.random.PRNGKey(1), d)
    out1 = L.hyperbolic_union_layer(params, h, rel, snap, C)
    # rebuild with double padding: recover the FORWARD triples (rel < r)
    # — edges are stored destination-sorted, so the first half is no
    # longer the forward block
    real = _np.asarray(snap.edge_mask) > 0
    fwd = real & (_np.asarray(snap.rel) < r)
    triples = _np.stack([_np.asarray(snap.src)[fwd],
                         _np.asarray(snap.rel)[fwd],
                         _np.asarray(snap.dst)[fwd]], 1)
    snap2 = bs(triples, n, r, edge_bucket=256)
    out2 = L.hyperbolic_union_layer(params, h, rel, snap2, C)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_radius_weighting_downweights_distant_radii(rng):
    """Edges between nodes with very different radii carry less message."""
    d = 8
    n = 4
    triples = np.array([[0, 0, 2], [1, 0, 3]])
    snap = build_snapshot(triples, n, 1, edge_bucket=8)
    # node0 near origin, node1 far out; node2/3 receivers at mid radius
    tan = np.zeros((n, d), np.float32)
    tan[0, 0] = 0.01
    tan[1, 0] = 5.0
    tan[2, 1] = 1.0
    tan[3, 1] = 1.0
    h = H.exp_map_zero(jnp.asarray(tan), C)
    rel = jnp.zeros((2, d))
    params = L.init_hyperbolic_union_layer(jax.random.PRNGKey(2), d, self_loop=False)
    out_g1 = L.hyperbolic_union_layer(params, h, rel, snap, C, radius_gamma=5.0)
    out_g0 = L.hyperbolic_union_layer(params, h, rel, snap, C, radius_gamma=0.0)
    # receiver 3 gets message from far-radius node 1: heavily damped at gamma=5
    m1_g1 = np.linalg.norm(np.asarray(H.log_map_zero(out_g1, C))[3])
    m1_g0 = np.linalg.norm(np.asarray(H.log_map_zero(out_g0, C))[3])
    assert m1_g1 < m1_g0 * 0.5


def test_union_layer_pallas_impl_matches_xla(rng, tiny_graph):
    """impl="pallas" (MXU one-hot scatter) must match the XLA segment_sum
    path on both the ball and tangent layer variants."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.data import build_snapshot
    from regcn_tpu.hyperbolic import layers as L
    from regcn_tpu.hyperbolic import ops as H

    n, r, triples = tiny_graph
    d, c = 16, 0.01
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    h = H.exp_map_zero(jnp.asarray(rng.normal(size=(n, d)).astype("float32") * 0.3), c)
    rel = jnp.asarray(rng.normal(size=(2 * r, d)).astype("float32") * 0.3)
    params = L.init_hyperbolic_union_layer(jax.random.PRNGKey(0), d, self_loop=True)
    with pltpu.force_tpu_interpret_mode():
        out_x = L.hyperbolic_union_layer(params, h, rel, snap, c, impl="xla")
        out_p = L.hyperbolic_union_layer(params, h, rel, snap, c, impl="pallas")
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                                   rtol=1e-5, atol=1e-6)
        v = H.log_map_zero(h, c)
        tx = L.union_layer_tangent(params, v, rel, snap, c, impl="xla")
        tp = L.union_layer_tangent(params, v, rel, snap, c, impl="pallas")
        np.testing.assert_allclose(np.asarray(tx), np.asarray(tp),
                                   rtol=1e-5, atol=1e-6)


def test_fhnn_edge_transform_onehot_matches_take(rng, tiny_graph):
    """The TPU gather-as-GEMM lowering is numerically the gather: one-hot
    0/1 weights pick weight rows exactly (round-5 fhnn speedup)."""
    import jax

    from regcn_tpu.data import build_snapshot
    from regcn_tpu.hyperbolic import layers as L

    n, r, triples = tiny_graph
    d = 16
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    params = L.init_fhnn_layer(jax.random.PRNGKey(3), d, 2 * r)
    tan_src = jnp.asarray(rng.normal(size=(len(snap.src), d)).astype(np.float32))
    take = L.fhnn_edge_transform(params["rel_weight"], tan_src, snap.rel,
                                 mode="take")
    onehot = L.fhnn_edge_transform(params["rel_weight"], tan_src, snap.rel,
                                   mode="onehot")
    np.testing.assert_allclose(np.asarray(onehot), np.asarray(take),
                               rtol=1e-6, atol=1e-6)

    # and gradients w.r.t. the weight table agree
    def loss(w, mode):
        return jnp.sum(
            L.fhnn_edge_transform(w, tan_src, snap.rel, mode=mode) ** 2)

    g_take = jax.grad(loss)(params["rel_weight"], "take")
    g_onehot = jax.grad(loss)(params["rel_weight"], "onehot")
    np.testing.assert_allclose(np.asarray(g_onehot), np.asarray(g_take),
                               rtol=1e-5, atol=1e-5)
