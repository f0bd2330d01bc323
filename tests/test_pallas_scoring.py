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


def test_rgcn_aggregate_pallas_matches_xla(rng, tiny_graph):
    from jax.experimental.pallas import tpu as pltpu

    from regcn_tpu.data import build_snapshot
    from regcn_tpu.ops.pallas_rgcn import rgcn_aggregate_pallas
    from regcn_tpu.ops.rgcn_scatter import _rgcn_aggregate_xla

    n, r, triples = tiny_graph
    d = 16
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rel_emb = jnp.asarray(rng.normal(size=(2 * r, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    args = (h, rel_emb, w, jnp.asarray(snap.src), jnp.asarray(snap.dst),
            jnp.asarray(snap.rel), jnp.asarray(snap.edge_mask),
            jnp.asarray(snap.in_deg_norm))
    expected = _rgcn_aggregate_xla(*args)
    with pltpu.force_tpu_interpret_mode():
        got = rgcn_aggregate_pallas(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-4)
