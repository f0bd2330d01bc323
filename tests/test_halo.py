"""Edge-partitioned shard_map aggregation vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.data import build_snapshot
from regcn_tpu.ops.rgcn_scatter import _rgcn_aggregate_xla
from regcn_tpu.parallel.halo import partition_edges_by_dst, sharded_rgcn_aggregate
from regcn_tpu.parallel.mesh import MeshAxes, make_mesh


@pytest.mark.parametrize("num_shards", [2, 4, 8])
def test_partitioned_aggregate_matches_unsharded(rng, tiny_graph, num_shards):
    n, r, triples = tiny_graph
    d = 16
    mesh = make_mesh(MeshAxes(data=1, graph=num_shards),
                     devices=jax.devices()[:num_shards])
    edges = partition_edges_by_dst(triples, n, r, num_shards, edge_bucket=32)
    rows = edges.rows_per_shard
    n_pad = num_shards * rows

    h = rng.normal(size=(n_pad, d)).astype(np.float32)
    rel_emb = rng.normal(size=(2 * r, d)).astype(np.float32)
    w = rng.normal(size=(d, d)).astype(np.float32)

    out = sharded_rgcn_aggregate(mesh, jnp.asarray(h), jnp.asarray(rel_emb),
                                 jnp.asarray(w), edges)

    snap = build_snapshot(triples, n, r, edge_bucket=32)
    expected = _rgcn_aggregate_xla(
        jnp.asarray(h[:n]), jnp.asarray(rel_emb), jnp.asarray(w),
        jnp.asarray(snap.src), jnp.asarray(snap.dst), jnp.asarray(snap.rel),
        jnp.asarray(snap.edge_mask), jnp.asarray(snap.in_deg_norm),
    )
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(expected),
                               rtol=2e-4, atol=2e-4)
    # padded rows (beyond n) have no in-edges -> zeros
    if n_pad > n:
        np.testing.assert_allclose(np.asarray(out)[n:], 0.0, atol=1e-6)


def test_partition_covers_all_edges(rng, tiny_graph):
    n, r, triples = tiny_graph
    edges = partition_edges_by_dst(triples, n, r, 4, edge_bucket=16)
    total = int(edges.edge_mask.sum())
    assert total == 2 * len(triples)
    # every edge's dst_local is within its shard's row range
    rows = edges.rows_per_shard
    assert int(edges.dst_local.max()) < rows


@pytest.mark.parametrize("num_shards", [2, 4, 8])
def test_boundary_halo_matches_unsharded(rng, tiny_graph, num_shards):
    """Boundary-set all_to_all halo == single-device aggregation, and the
    measured halo volume is below the dense all-gather's."""
    from regcn_tpu.parallel.halo import (
        halo_rgcn_aggregate,
        partition_edges_boundary,
    )

    n, r, triples = tiny_graph
    d = 16
    mesh = make_mesh(MeshAxes(data=1, graph=num_shards),
                     devices=jax.devices()[:num_shards])
    edges, stats = partition_edges_boundary(triples, n, r, num_shards,
                                            edge_bucket=32, halo_bucket=8)
    rows = edges.rows_per_shard
    n_pad = num_shards * rows

    h = rng.normal(size=(n_pad, d)).astype(np.float32)
    rel_emb = rng.normal(size=(2 * r, d)).astype(np.float32)
    w = rng.normal(size=(d, d)).astype(np.float32)

    out = halo_rgcn_aggregate(mesh, jnp.asarray(h), jnp.asarray(rel_emb),
                              jnp.asarray(w), edges)

    snap = build_snapshot(triples, n, r, edge_bucket=32)
    expected = _rgcn_aggregate_xla(
        jnp.asarray(h[:n]), jnp.asarray(rel_emb), jnp.asarray(w),
        jnp.asarray(snap.src), jnp.asarray(snap.dst), jnp.asarray(snap.rel),
        jnp.asarray(snap.edge_mask), jnp.asarray(snap.in_deg_norm),
    )
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(expected),
                               rtol=2e-4, atol=2e-4)
    if n_pad > n:
        np.testing.assert_allclose(np.asarray(out)[n:], 0.0, atol=1e-6)
    assert stats["boundary_rows_total"] > 0
    # a row needed by k shards counts k times, so the hard bound is G
    # (this tiny fixture graph is dense; realistic snapshots sit far
    # below it — see tools/bench_scaling.py's measured numbers)
    assert stats["boundary_fraction_of_N"] <= num_shards


def test_boundary_partition_covers_all_edges(rng, tiny_graph):
    from regcn_tpu.parallel.halo import partition_edges_boundary

    n, r, triples = tiny_graph
    edges, stats = partition_edges_boundary(triples, n, r, 4,
                                            edge_bucket=16, halo_bucket=8)
    total = int(edges.int_mask.sum() + edges.rem_mask.sum())
    assert total == 2 * len(triples)
    assert int(edges.int_dst_local.max()) < edges.rows_per_shard
    assert int(edges.rem_dst_local.max()) < edges.rows_per_shard
    assert int(edges.rem_src_halo.max()) < 4 * edges.halo_per_pair
