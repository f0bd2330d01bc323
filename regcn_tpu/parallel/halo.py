"""Edge-partitioned RGCN aggregation over a device mesh (shard_map path).

The north-star distributed design (BASELINE.json; no counterpart exists
in the reference — SURVEY.md §2.5): each snapshot graph is partitioned
by DESTINATION entity shard, so the scatter-sum is entirely shard-local;
the only communication is the per-layer exchange of source-entity rows
(the "halo"), expressed here as an ``all_gather`` over the ``graph``
mesh axis which XLA lowers to ICI ring collectives. The GRU/decoder
stages run on the same entity-sharded layout (see
:mod:`regcn_tpu.parallel.sharding`).

Why all-gather rather than a targeted ppermute halo: for RE-GCN-family
graphs a snapshot's boundary set is a large fraction of active entities
(relations connect arbitrary entities, not spatial neighborhoods), so a
dense all-gather of the [N, d] table is within ~2x of the minimal
exchange while being compiler-schedulable (overlapped with the local
edge GEMM by XLA's latency-hiding scheduler). A Pallas ring pipeline
(pltpu.make_async_remote_copy) is the next refinement.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from regcn_tpu.parallel.mesh import GRAPH_AXIS

shard_map = jax.shard_map if hasattr(jax, "shard_map") else jax.experimental.shard_map.shard_map


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PartitionedEdges:
    """Edges partitioned by destination shard, padded per shard.

    Shapes [G, E_s]; ``dst_local`` is the row index within the owning
    shard. Built host-side by :func:`partition_edges_by_dst`.
    """

    src: jax.Array  # [G, E_s] global source ids
    dst_local: jax.Array  # [G, E_s] local destination row
    rel: jax.Array  # [G, E_s]
    edge_mask: jax.Array  # [G, E_s]
    in_deg_norm: jax.Array  # [G, rows_per_shard]
    has_in_edge: jax.Array  # [G, rows_per_shard]
    rows_per_shard: int = dataclasses.field(metadata={"static": True})


def partition_edges_by_dst(
    triples: np.ndarray, num_nodes: int, num_rels: int, num_shards: int,
    edge_bucket: int = 256,
) -> PartitionedEdges:
    """Host-side: inverse edges + degree norms + per-dst-shard split."""
    triples = np.asarray(triples)[:, :3].astype(np.int64)
    s, r, o = triples[:, 0], triples[:, 1], triples[:, 2]
    src = np.concatenate([s, o]).astype(np.int32)
    dst = np.concatenate([o, s]).astype(np.int32)
    rel = np.concatenate([r, r + num_rels]).astype(np.int32)

    rows = -(-num_nodes // num_shards)  # ceil: rows per shard
    in_deg = np.bincount(dst, minlength=num_shards * rows).astype(np.float32)
    shard_of = dst // rows
    dst_local = dst % rows

    per_shard = [np.flatnonzero(shard_of == g) for g in range(num_shards)]
    e_max = max((len(ix) for ix in per_shard), default=1)
    E_s = max(((e_max + edge_bucket - 1) // edge_bucket) * edge_bucket, edge_bucket)

    def pad2(vals_list, dtype, fill=0):
        out = np.full((num_shards, E_s), fill, dtype=dtype)
        for g, ix in enumerate(per_shard):
            out[g, : len(ix)] = vals_list[ix]
        return out

    mask = np.zeros((num_shards, E_s), np.float32)
    for g, ix in enumerate(per_shard):
        mask[g, : len(ix)] = 1.0

    in_deg_2d = in_deg.reshape(num_shards, rows)
    return PartitionedEdges(
        src=jnp.asarray(pad2(src, np.int32)),
        dst_local=jnp.asarray(pad2(dst_local, np.int32)),
        rel=jnp.asarray(pad2(rel, np.int32)),
        edge_mask=jnp.asarray(mask),
        in_deg_norm=jnp.asarray(1.0 / np.maximum(in_deg_2d, 1.0)),
        has_in_edge=jnp.asarray((in_deg_2d > 0).astype(np.float32)),
        rows_per_shard=rows,
    )


def sharded_rgcn_aggregate(
    mesh: Mesh,
    h: jax.Array,  # [G*rows, d] entity states, row-sharded over "graph"
    rel_emb: jax.Array,  # [2R, d] replicated
    weight: jax.Array,  # [d, d] replicated
    edges: PartitionedEdges,
) -> jax.Array:
    """Shard-local scatter with all-gather halo exchange. Returns the
    aggregated [G*rows, d] array, row-sharded like ``h``."""
    rows = edges.rows_per_shard

    def local_fn(h_local, src, dst_local, rel, mask, norm):
        # halo: gather every shard's rows (XLA lowers to an ICI ring);
        # h_local [1, rows, d] -> h_full [G*rows, d]
        h_full = jax.lax.all_gather(h_local[0], GRAPH_AXIS, tiled=True)
        msg = (h_full[src[0]] + rel_emb[rel[0]]) @ weight
        msg = msg * mask[0][:, None]
        agg = jax.ops.segment_sum(msg, dst_local[0], num_segments=rows)
        return (agg * norm[0][:, None])[None]

    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS, None),  # h reshaped [G, rows, d]
            P(GRAPH_AXIS, None), P(GRAPH_AXIS, None), P(GRAPH_AXIS, None),
            P(GRAPH_AXIS, None), P(GRAPH_AXIS, None),
        ),
        out_specs=P(GRAPH_AXIS, None),
        check_vma=False,
    )
    G = mesh.shape[GRAPH_AXIS]
    h3 = h.reshape(G, rows, -1)
    out = f(h3, edges.src, edges.dst_local, edges.rel, edges.edge_mask,
            edges.in_deg_norm)
    return out.reshape(G * rows, -1)
