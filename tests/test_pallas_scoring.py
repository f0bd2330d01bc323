"""Pallas streaming-CE kernel vs the XLA fused path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.hyperbolic import decoders as D
from regcn_tpu.hyperbolic import ops as H

C = 0.01


def test_streaming_ce_matches_xla(rng, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.ops.pallas_scoring import streaming_dist_ce_loss

    B, N, d = 16, 70, 8
    q = H.project_to_ball(jnp.asarray(rng.normal(size=(B, d)).astype(np.float32)), C)
    x = H.project_to_ball(jnp.asarray(rng.normal(size=(N, d)).astype(np.float32) * 2), C)
    tgt = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    bias = jnp.asarray(rng.normal(size=N).astype(np.float32))
    mask = jnp.asarray((np.arange(B) < 12).astype(np.float32))

    expected = D.dist_ce_loss(
        q, x, tgt, C, mask=mask, candidate_bias=bias,
        score_scale=jnp.asarray(1.3), score_margin=jnp.asarray(0.7),
    )
    with pltpu.force_tpu_interpret_mode():
        got = streaming_dist_ce_loss(
            q, x, tgt, C, mask=mask, candidate_bias=bias,
            score_scale=jnp.asarray(1.3), score_margin=0.7, block_n=32,
        )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_scatter_add_sorted_matches_segment_sum(rng):
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.ops.pallas_rgcn import scatter_add_sorted

    E, N, d = 96, 40, 8
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    msg = rng.normal(size=(E, d)).astype(np.float32)
    expected = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(dst), num_segments=N)
    with pltpu.force_tpu_interpret_mode():
        got = scatter_add_sorted(jnp.asarray(msg), jnp.asarray(dst), N,
                                 tile_edges=32, chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dst_sorted", [False, True])
def test_rgcn_aggregate_pallas_matches_xla(rng, tiny_graph, dst_sorted):
    """dst_sorted=True is the branch the baseline union layer takes for
    builder-produced snapshots (Snapshot.dst_sorted) — the skip-argsort
    aliasing needs direct coverage, not just via the hyperbolic path."""
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.data import build_snapshot
    from regcn_tpu.ops.pallas_rgcn import rgcn_aggregate_pallas
    from regcn_tpu.ops.rgcn_scatter import _rgcn_aggregate_xla

    n, r, triples = tiny_graph
    d = 16
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    assert snap.dst_sorted  # builder output is the canonical sorted order
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rel_emb = jnp.asarray(rng.normal(size=(2 * r, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    args = (h, rel_emb, w, jnp.asarray(snap.src), jnp.asarray(snap.dst),
            jnp.asarray(snap.rel), jnp.asarray(snap.edge_mask),
            jnp.asarray(snap.in_deg_norm))
    expected = _rgcn_aggregate_xla(*args)
    with pltpu.force_tpu_interpret_mode():
        got = rgcn_aggregate_pallas(*args, dst_sorted=dst_sorted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-4)


def test_streaming_ce_gradients_match_xla_path():
    """The custom-VJP backward (tile-recompute) must match jax.grad of the
    dense dist_ce_loss for every differentiable input."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.hyperbolic import decoders as D
    from regcn_tpu.hyperbolic import ops as H
    from regcn_tpu.ops.pallas_scoring import streaming_dist_ce_loss

    rng = np.random.default_rng(3)
    B, N, d, c = 24, 1100, 16, 0.01
    q = H.exp_map_zero(jnp.asarray(rng.normal(size=(B, d)).astype("float32") * 0.4), c)
    x = H.exp_map_zero(jnp.asarray(rng.normal(size=(N, d)).astype("float32") * 0.4), c)
    tgt = jnp.asarray(rng.integers(0, N, B))
    bias = jnp.asarray(rng.normal(size=N).astype("float32") * 0.1)
    mask = jnp.asarray((rng.uniform(size=B) > 0.2).astype("float32"))

    def dense(q, x, bias, c, scale, margin):
        return D.dist_ce_loss(q, x, tgt, c, mask=mask, candidate_bias=bias,
                              score_scale=scale, score_margin=margin,
                              streaming=False)

    def stream(q, x, bias, c, scale, margin):
        return streaming_dist_ce_loss(q, x, tgt, c, mask=mask,
                                      candidate_bias=bias, score_scale=scale,
                                      score_margin=margin, block_n=256)

    args = (q, x, bias, jnp.float32(c), jnp.float32(1.3), jnp.float32(0.7))
    with pltpu.force_tpu_interpret_mode():
        ld = dense(*args)
        ls = stream(*args)
        np.testing.assert_allclose(float(ld), float(ls), rtol=1e-5)
        gd = jax.grad(dense, argnums=(0, 1, 2, 3, 4, 5))(*args)
        gs = jax.grad(stream, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_dist_ce_loss_auto_streaming_dispatch():
    """streaming="auto" stays on the dense path off-TPU / small N / curved
    paths; explicit True routes through the kernel."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.hyperbolic import decoders as D
    from regcn_tpu.hyperbolic import ops as H

    rng = np.random.default_rng(5)
    B, N, d, c = 8, 600, 16, 0.01
    q = H.exp_map_zero(jnp.asarray(rng.normal(size=(B, d)).astype("float32") * 0.4), c)
    x = H.exp_map_zero(jnp.asarray(rng.normal(size=(N, d)).astype("float32") * 0.4), c)
    tgt = jnp.asarray(rng.integers(0, N, B))
    auto = D.dist_ce_loss(q, x, tgt, c)  # small N -> dense path
    with pltpu.force_tpu_interpret_mode():
        forced = D.dist_ce_loss(q, x, tgt, c, streaming=True)
    np.testing.assert_allclose(float(auto), float(forced), rtol=1e-5)


def test_streaming_ce_true_distance_per_query_curvature():
    """Round-3: the kernel covers the true-distance path with per-query
    (relation-specific) curvature (ref:hyperbolic_decoder.py:704-727) —
    value AND gradients vs the dense dist_ce_loss, incl. d/d(curvature)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.hyperbolic import decoders as D
    from regcn_tpu.hyperbolic import ops as H
    from regcn_tpu.ops.pallas_scoring import streaming_dist_ce_loss

    rng = np.random.default_rng(9)
    B, N, d, c = 24, 900, 16, 0.01
    q = H.exp_map_zero(jnp.asarray(rng.normal(size=(B, d)).astype("float32") * 0.4), c)
    x = H.exp_map_zero(jnp.asarray(rng.normal(size=(N, d)).astype("float32") * 0.4), c)
    tgt = jnp.asarray(rng.integers(0, N, B))
    bias = jnp.asarray(rng.normal(size=N).astype("float32") * 0.1)
    mask = jnp.asarray((rng.uniform(size=B) > 0.2).astype("float32"))
    qc = jnp.asarray(rng.uniform(0.005, 0.05, size=B).astype("float32"))

    def dense(q, x, bias, qc, scale, margin):
        return D.dist_ce_loss(q, x, tgt, c, mask=mask, candidate_bias=bias,
                              score_scale=scale, score_margin=margin,
                              query_curvature=qc,
                              use_hyperbolic_distance=True, streaming=False)

    def stream(q, x, bias, qc, scale, margin):
        return streaming_dist_ce_loss(
            q, x, tgt, c, mask=mask, candidate_bias=bias, score_scale=scale,
            score_margin=margin, query_curvature=qc,
            use_hyperbolic_distance=True, block_n=256)

    args = (q, x, bias, qc, jnp.float32(1.3), jnp.float32(0.7))
    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(float(dense(*args)), float(stream(*args)),
                                   rtol=1e-5)
        gd = jax.grad(dense, argnums=(0, 1, 2, 3, 4, 5))(*args)
        gs = jax.grad(stream, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_streaming_ce_true_distance_scalar_curvature():
    """True-distance path, uniform curvature (no per-query vector)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.hyperbolic import decoders as D
    from regcn_tpu.hyperbolic import ops as H

    rng = np.random.default_rng(13)
    B, N, d, c = 8, 600, 16, 0.02
    q = H.exp_map_zero(jnp.asarray(rng.normal(size=(B, d)).astype("float32") * 0.4), c)
    x = H.exp_map_zero(jnp.asarray(rng.normal(size=(N, d)).astype("float32") * 0.4), c)
    tgt = jnp.asarray(rng.integers(0, N, B))
    dense = D.dist_ce_loss(q, x, tgt, c, use_hyperbolic_distance=True,
                           streaming=False)
    with pltpu.force_tpu_interpret_mode():
        stream = D.dist_ce_loss(q, x, tgt, c, use_hyperbolic_distance=True,
                                streaming=True)
    np.testing.assert_allclose(float(dense), float(stream), rtol=1e-5)
