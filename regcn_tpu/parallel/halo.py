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


# ------------------------------------------------ boundary halo exchange

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HaloPartitionedEdges:
    """Destination-sharded edges with a BOUNDARY-SET halo.

    Interior edges (source owned by the destination shard) read the local
    rows directly; remote edges read a compact halo buffer assembled by a
    single ``all_to_all``: owner ``g`` sends requester ``q`` exactly the
    unique source rows q's edges need from g (``send_idx[g, q]``), padded
    to ``halo_per_pair``. Per-shard comm volume is ``G * P * d`` rows
    instead of the dense all-gather's ``N * d`` (ICEWS-family snapshots
    touch a few hundred of thousands of entities, so P << rows).
    Built host-side by :func:`partition_edges_boundary`.
    """

    int_src_local: jax.Array  # [G, Ei] local row of the source
    int_dst_local: jax.Array  # [G, Ei]
    int_rel: jax.Array  # [G, Ei]
    int_mask: jax.Array  # [G, Ei]
    rem_src_halo: jax.Array  # [G, Er] index into the [G*P] halo buffer
    rem_dst_local: jax.Array  # [G, Er]
    rem_rel: jax.Array  # [G, Er]
    rem_mask: jax.Array  # [G, Er]
    send_idx: jax.Array  # [G owners, G requesters, P] local row ids
    in_deg_norm: jax.Array  # [G, rows_per_shard]
    has_in_edge: jax.Array  # [G, rows_per_shard]
    rows_per_shard: int = dataclasses.field(metadata={"static": True})
    halo_per_pair: int = dataclasses.field(metadata={"static": True})


def _boundary_core(triples: np.ndarray, num_nodes: int, num_rels: int,
                   num_shards: int) -> dict:
    """Host-side partition of one snapshot's edges into interior/remote
    per-destination-shard lists plus the per-(owner, requester) unique
    source-row need tables. Pure numpy; packing/bucketing happens in
    :func:`_pack_boundary` so a whole split can share bucket sizes."""
    triples = np.asarray(triples)
    triples = triples.reshape(-1, triples.shape[-1] if triples.ndim > 1 else 3)
    triples = triples[:, :3].astype(np.int64)
    s, r, o = triples[:, 0], triples[:, 1], triples[:, 2]
    src = np.concatenate([s, o]).astype(np.int32)
    dst = np.concatenate([o, s]).astype(np.int32)
    rel = np.concatenate([r, r + num_rels]).astype(np.int32)

    G = num_shards
    rows = -(-num_nodes // G)
    in_deg = np.bincount(dst, minlength=G * rows).astype(np.float32)
    owner_src = src // rows
    shard_of = dst // rows

    int_lists, rem_lists = [], []  # per shard: (src_local/halo, dst_local, rel)
    need_per_pair = [[np.empty(0, np.int64)] * G for _ in range(G)]
    for q in range(G):
        ix = np.flatnonzero(shard_of == q)
        own = owner_src[ix] == q
        ii = ix[own]
        ri = ix[~own]
        int_lists.append((src[ii] % rows, dst[ii] % rows, rel[ii]))
        # per-owner unique needed rows + halo-local edge indices
        halo_idx = np.zeros(len(ri), np.int64)
        for g in range(G):
            sel = owner_src[ri] == g
            uniq, inv = np.unique(src[ri[sel]], return_inverse=True)
            need_per_pair[g][q] = uniq % rows
            halo_idx[sel] = inv  # position within (g, q)'s block; offset later
        rem_lists.append((halo_idx, dst[ri] % rows, rel[ri], owner_src[ri]))

    return {
        "int_lists": int_lists,
        "rem_lists": rem_lists,
        "need_per_pair": need_per_pair,
        "in_deg_2d": in_deg.reshape(G, rows),
        "rows": rows,
        "max_int": max((len(t[0]) for t in int_lists), default=1),
        "max_rem": max((len(t[0]) for t in rem_lists), default=1),
        "max_pair": max((len(need_per_pair[g][q])
                         for g in range(G) for q in range(G)), default=1),
    }


def _pack_boundary(core: dict, G: int, Ei: int, Er: int, P: int) -> dict:
    """Pad/pack one snapshot's core partition into fixed-size numpy
    arrays (field dict mirroring :class:`HaloPartitionedEdges`)."""
    send_idx = np.zeros((G, G, P), np.int32)
    for g in range(G):
        for q in range(G):
            u = core["need_per_pair"][g][q]
            send_idx[g, q, : len(u)] = u

    def pack(lists, E, cols):
        out = [np.zeros((G, E), np.int32) for _ in range(cols)]
        mask = np.zeros((G, E), np.float32)
        for g, vals in enumerate(lists):
            k = len(vals[0])
            for c in range(cols):
                out[c][g, :k] = vals[c]
            mask[g, :k] = 1.0
        return out, mask

    (i_src, i_dst, i_rel), i_mask = pack(core["int_lists"], Ei, 3)
    rem_packed = []
    for halo_idx, dstl, relv, owners in core["rem_lists"]:
        rem_packed.append((owners * P + halo_idx, dstl, relv))
    (r_src, r_dst, r_rel), r_mask = pack(rem_packed, Er, 3)
    in_deg_2d = core["in_deg_2d"]
    return {
        "int_src_local": i_src, "int_dst_local": i_dst,
        "int_rel": i_rel, "int_mask": i_mask,
        "rem_src_halo": r_src, "rem_dst_local": r_dst,
        "rem_rel": r_rel, "rem_mask": r_mask,
        "send_idx": send_idx,
        "in_deg_norm": 1.0 / np.maximum(in_deg_2d, 1.0),
        "has_in_edge": (in_deg_2d > 0).astype(np.float32),
    }


def _boundary_stats(core: dict, G: int, P: int, num_nodes: int) -> dict:
    rows = core["rows"]
    boundary_rows = sum(len(core["need_per_pair"][g][q])
                        for g in range(G) for q in range(G))
    return {
        "boundary_rows_total": boundary_rows,
        "boundary_fraction_of_N": boundary_rows / max(num_nodes, 1),
        "halo_rows_per_shard": G * P,
        "allgather_rows_per_shard": G * rows,
        "volume_ratio_vs_allgather": (G * P) / max(G * rows, 1),
    }


def _bucketed(n: int, bucket: int) -> int:
    return max(((n + bucket - 1) // bucket) * bucket, bucket)


def partition_edges_boundary(
    triples: np.ndarray, num_nodes: int, num_rels: int, num_shards: int,
    edge_bucket: int = 256, halo_bucket: int = 64,
) -> Tuple[HaloPartitionedEdges, dict]:
    """Host-side boundary-halo partition. Returns (edges, stats) where
    stats records the measured boundary-set sizes vs N (the claim the
    dense all-gather variant could never substantiate)."""
    G = num_shards
    core = _boundary_core(triples, num_nodes, num_rels, G)
    P = _bucketed(core["max_pair"], halo_bucket)
    Ei = _bucketed(core["max_int"], edge_bucket)
    Er = _bucketed(core["max_rem"], edge_bucket)
    fields = _pack_boundary(core, G, Ei, Er, P)
    edges = HaloPartitionedEdges(
        **{k: jnp.asarray(v) for k, v in fields.items()},
        rows_per_shard=core["rows"], halo_per_pair=P,
    )
    return edges, _boundary_stats(core, G, P, num_nodes)


def build_halo_store(
    snap_list: List[np.ndarray], num_nodes: int, num_rels: int,
    num_shards: int, pad_front: int = 0,
    edge_bucket: int = 256, halo_bucket: int = 64,
) -> Tuple[HaloPartitionedEdges, dict]:
    """Stacked halo partitions for a whole split: every array field gains
    a leading ``[S]`` axis (``S = pad_front + len(snap_list)``) with
    bucket sizes shared across snapshots, ready to attach to a
    :class:`regcn_tpu.train.epoch.SnapshotStore` and be window-sliced per
    fused-epoch step. ``pad_front`` prepends empty (all-masked)
    partitions matching the store's empty identity snapshots.

    Returns (stacked edges, stats) where stats aggregates the measured
    per-snapshot boundary sizes (mean/max ``boundary_fraction_of_N``,
    halo-vs-allgather volume ratio).
    """
    G = num_shards
    empty = np.zeros((0, 3), np.int64)
    cores = [_boundary_core(t, num_nodes, num_rels, G)
             for t in [empty] * pad_front + list(snap_list)]
    P = _bucketed(max(c["max_pair"] for c in cores), halo_bucket)
    Ei = _bucketed(max(c["max_int"] for c in cores), edge_bucket)
    Er = _bucketed(max(c["max_rem"] for c in cores), edge_bucket)
    packed = [_pack_boundary(c, G, Ei, Er, P) for c in cores]
    stacked = {k: jnp.asarray(np.stack([p[k] for p in packed]))
               for k in packed[0]}
    edges = HaloPartitionedEdges(
        **stacked, rows_per_shard=cores[0]["rows"], halo_per_pair=P,
    )
    per_snap = [_boundary_stats(c, G, P, num_nodes)
                for c in cores[pad_front:]]
    fracs = [s["boundary_fraction_of_N"] for s in per_snap] or [0.0]
    stats = {
        "num_snapshots": len(snap_list),
        "num_shards": G,
        "boundary_fraction_of_N_mean": float(np.mean(fracs)),
        "boundary_fraction_of_N_max": float(np.max(fracs)),
        "halo_rows_per_shard": G * P,
        "allgather_rows_per_shard": G * cores[0]["rows"],
        "volume_ratio_vs_allgather": (G * P) / max(G * cores[0]["rows"], 1),
    }
    return edges, stats


def halo_local_aggregate(
    mesh: Mesh,
    h: jax.Array,  # [N, d] node states, row-sharded over "graph"
    edges: HaloPartitionedEdges,
    local_fn,
) -> jax.Array:
    """Generic boundary-halo exchange + shard-local aggregation.

    The sum path has a dedicated fused kernel (:func:`halo_rgcn_aggregate`);
    this wrapper serves every OTHER aggregation the hyperbolic encoders
    use — Einstein midpoint (ref:hyperbolic_layers.py:371-395), Lorentz
    centroid (ref:hyperbolic_ops.py:563-581), HGAT segment softmax
    (ref:hyperbolic_layers.py:847-873). All of them are weighted segment
    reductions over DESTINATION segments, and the edges are partitioned
    by destination shard, so the reductions are exactly shard-local: the
    only communication any of them needs is the same source-row
    ``all_to_all`` as the sum halo.

    ``local_fn(hbuf, src, dst, mask, rel, norm, has_in, rows)`` runs per
    shard and must return ``[rows, d_out]``:

    - ``hbuf``: ``[rows + G*P, d]`` — this shard's local rows followed by
      the received halo buffer. Per-row maps (log/exp, conformal
      factors) computed on ``hbuf`` match the unsharded full-table
      computation row for row.
    - ``src``: ``[Ei+Er]`` per-edge index into ``hbuf`` (interior edges
      point below ``rows``, remote edges into the halo region);
      ``dst``/``mask``/``rel``: ``[Ei+Er]`` with ``dst`` local;
      ``norm``/``has_in``: ``[rows]``.

    Segment reductions inside ``local_fn`` use ``num_segments=rows``.
    ``h`` is zero-padded to ``G*rows`` and sliced back, like
    :func:`halo_rgcn_aggregate`.
    """
    rows = edges.rows_per_shard
    G = mesh.shape[GRAPH_AXIS]
    n = h.shape[0]
    n_pad = G * rows
    ent_rows = NamedSharding(mesh, P(GRAPH_AXIS, None))
    if n != n_pad:
        h_full = jnp.pad(h, ((0, n_pad - n), (0, 0)))
        h_full = jax.lax.with_sharding_constraint(h_full, ent_rows)
    else:
        h_full = h

    def shard_fn(h3, isrc, idst, irel, imask, rsrc, rdst, rrel, rmask,
                 sidx, norm, has_in):
        h_local = h3[0]  # [rows, d]
        send = h_local[sidx[0]]  # [G requesters, P, d]
        halo = jax.lax.all_to_all(
            send, GRAPH_AXIS, split_axis=0, concat_axis=0, tiled=True)
        hbuf = jnp.concatenate(
            [h_local, halo.reshape(-1, h_local.shape[1])], axis=0)
        src = jnp.concatenate([isrc[0], rows + rsrc[0]])
        dst = jnp.concatenate([idst[0], rdst[0]])
        rel = jnp.concatenate([irel[0], rrel[0]])
        mask = jnp.concatenate([imask[0], rmask[0]])
        out = local_fn(hbuf, src, dst, mask, rel, norm[0], has_in[0], rows)
        return out[None]

    g_spec = P(GRAPH_AXIS, None)
    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            g_spec,
            g_spec, g_spec, g_spec, g_spec,  # interior edges
            g_spec, g_spec, g_spec, g_spec,  # remote edges
            P(GRAPH_AXIS, None, None),  # send_idx, owner-sharded
            g_spec, g_spec,  # in_deg_norm, has_in_edge
        ),
        out_specs=g_spec,
        check_vma=False,
    )
    h3 = h_full.reshape(G, rows, -1)
    out = f(h3, edges.int_src_local, edges.int_dst_local, edges.int_rel,
            edges.int_mask, edges.rem_src_halo, edges.rem_dst_local,
            edges.rem_rel, edges.rem_mask, edges.send_idx,
            edges.in_deg_norm, edges.has_in_edge)
    out = out.reshape(n_pad, -1)
    if n != n_pad:
        # no row-sharding constraint on the slice: n may not divide the
        # mesh (the trainers enforce divisibility; standalone layer calls
        # need not) — GSPMD re-partitions downstream as needed
        out = out[:n]
    return out


def halo_rgcn_aggregate(
    mesh: Mesh,
    h: jax.Array,  # [N, d] entity states, row-sharded over "graph"
    rel_emb: jax.Array,  # [2R, d] replicated
    weight: jax.Array,  # [d, d] replicated
    edges: HaloPartitionedEdges,
    *,
    row_scalar_fn=None,  # rows [n, d] -> [n] per-row scalar (e.g. radius)
    edge_weight_fn=None,  # (scalar_src [E], scalar_dst [E]) -> [E] weight
) -> jax.Array:
    """Boundary-set halo exchange overlapped with local aggregation.

    Per shard: the interior edge GEMM + scatter has no dependency on the
    ``all_to_all``, so XLA's latency-hiding scheduler runs the collective
    concurrently with it; only the (small) remote-edge GEMM waits on the
    halo buffer.

    ``row_scalar_fn``/``edge_weight_fn`` support radius-weighted messages
    (the hyperbolic union layers, ref:hyperbolic_layers.py:229-236):
    scalars are computed per ROW (local + halo buffer) and gathered per
    edge, so the extra cost is O(rows) not O(E·d). Messages accumulate in
    fp32 (``preferred_element_type``) and return in ``h.dtype``, matching
    :func:`regcn_tpu.ops.rgcn_scatter._rgcn_aggregate_xla`.

    ``h`` may have fewer rows than ``G*rows_per_shard`` (entity counts
    not divisible by the mesh); it is zero-padded in and sliced back out.
    """
    rows = edges.rows_per_shard
    G = mesh.shape[GRAPH_AXIS]
    n = h.shape[0]
    n_pad = G * rows
    ent_rows = NamedSharding(mesh, P(GRAPH_AXIS, None))
    if n != n_pad:
        h_full = jnp.pad(h, ((0, n_pad - n), (0, 0)))
        h_full = jax.lax.with_sharding_constraint(h_full, ent_rows)
    else:
        h_full = h

    def local_fn(h3, isrc, idst, irel, imask, rsrc, rdst, rrel, rmask,
                 sidx, norm):
        h_local = h3[0]  # [rows, d]
        # launch the halo exchange FIRST; the interior work below is
        # independent, so the collective overlaps with it
        send = h_local[sidx[0]]  # [G requesters, P, d]
        halo = jax.lax.all_to_all(
            send, GRAPH_AXIS, split_axis=0, concat_axis=0, tiled=True)
        halo_flat = halo.reshape(-1, h_local.shape[1])  # [G*P, d]

        iw, rw = imask[0], rmask[0]
        if edge_weight_fn is not None:
            s_local = row_scalar_fn(h_local)  # [rows]
            s_halo = row_scalar_fn(halo_flat)  # [G*P]
            iw = iw * edge_weight_fn(s_local[isrc[0]], s_local[idst[0]])
            rw = rw * edge_weight_fn(s_halo[rsrc[0]], s_local[rdst[0]])

        msg_i = jnp.dot(h_local[isrc[0]] + rel_emb[irel[0]], weight,
                        preferred_element_type=jnp.float32)
        msg_i = msg_i * iw[:, None].astype(msg_i.dtype)
        agg = jax.ops.segment_sum(msg_i, idst[0], num_segments=rows)
        msg_r = jnp.dot(halo_flat[rsrc[0]] + rel_emb[rrel[0]], weight,
                        preferred_element_type=jnp.float32)
        msg_r = msg_r * rw[:, None].astype(msg_r.dtype)
        agg = agg + jax.ops.segment_sum(msg_r, rdst[0], num_segments=rows)
        out = agg * norm[0][:, None].astype(agg.dtype)
        return out.astype(h_local.dtype)[None]

    g_spec = P(GRAPH_AXIS, None)
    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            g_spec,  # h reshaped [G, rows, d]
            g_spec, g_spec, g_spec, g_spec,  # interior edges
            g_spec, g_spec, g_spec, g_spec,  # remote edges
            P(GRAPH_AXIS, None, None),  # send_idx, owner-sharded
            g_spec,  # in_deg_norm
        ),
        out_specs=g_spec,
        check_vma=False,
    )
    h3 = h_full.reshape(G, rows, -1)
    out = f(h3, edges.int_src_local, edges.int_dst_local, edges.int_rel,
            edges.int_mask, edges.rem_src_halo, edges.rem_dst_local,
            edges.rem_rel, edges.rem_mask, edges.send_idx, edges.in_deg_norm)
    out = out.reshape(n_pad, -1)
    if n != n_pad:
        out = jax.lax.with_sharding_constraint(out[:n], ent_rows)
    return out
