"""Snapshot graph construction as flat padded edge arrays.

TPU-first replacement for the reference's DGL graph builder
(ref:rgcn/utils.py:100-134 ``build_sub_graph`` and :78-97 ``r2e``):
instead of a dynamic ``dgl.graph`` with node/edge feature dicts, a
snapshot is a pytree of fixed-shape numpy arrays (padded to bucketed
sizes) that can be stacked into a ``[T, ...]`` history window and scanned
with ``lax.scan`` under jit.

Semantics preserved:
- inverse edges: for every triple (s, r, o) an edge s->o with type r and
  o->s with type r+R are added (ref:rgcn/utils.py:116-118);
- message normalisation is 1/in_degree of the destination node, with
  isolated nodes clamped to 1 (ref:rgcn/utils.py:110-114);
- the relation-context incidence used for relation-embedding evolution:
  for every base relation r present in the snapshot, the set of entities
  incident to r-edges; both r and r+R share that set
  (ref:rgcn/utils.py:78-97, consumed at ref:src/rrgcn.py:161-166).
  Here it is a flat (rel_id, ent_id) pair list reduced with segment ops
  rather than a Python loop over spans.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import numpy as np


def _round_up(n: int, multiple: int) -> int:
    if multiple <= 1:
        return max(n, 1)
    return max(((n + multiple - 1) // multiple) * multiple, multiple)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Snapshot:
    """One timestamp's padded graph. All arrays are host numpy.

    Shapes: E = padded edge count (2x triples, inverses included),
    M = padded relation-context pair count, N = num_nodes (static).
    """

    src: np.ndarray  # [E] int32, padded with 0
    dst: np.ndarray  # [E] int32, padded with 0
    rel: np.ndarray  # [E] int32 in [0, 2R), padded with 0
    edge_mask: np.ndarray  # [E] float32 {0,1}
    in_deg_norm: np.ndarray  # [N] float32: 1/max(in_deg,1)
    has_in_edge: np.ndarray  # [N] float32 {0,1}: in_deg > 0
    rc_rel: np.ndarray  # [M] int32 relation id in [0, 2R)
    rc_ent: np.ndarray  # [M] int32 entity id
    rc_mask: np.ndarray  # [M] float32 {0,1}
    num_edges: int = dataclasses.field(metadata={"static": True})  # unpadded edges
    num_triples: int = dataclasses.field(metadata={"static": True})  # unpadded triples
    # optional boundary-halo partition of the same edges (a
    # parallel.halo.HaloPartitionedEdges pytree) for shard_map
    # aggregation under a device mesh; None on the single-chip path
    halo: object = None
    # True when the real edges are stored destination-sorted (padded tail
    # last) — lets the Pallas scatter skip its in-step argsort
    # (ops/pallas_rgcn.py); builders set it, hand-built snapshots default
    # to the safe False
    dst_sorted: bool = dataclasses.field(metadata={"static": True},
                                         default=False)


# A "SnapshotBatch" is a Snapshot whose fields carry a leading time axis
# [T, ...]; same class, produced by stack_history.
SnapshotBatch = Snapshot


def split_by_time(data: np.ndarray) -> List[np.ndarray]:
    """Group time-ordered quads [N,4] into per-timestamp triple arrays [n,3].

    Parity with ref:rgcn/utils.py:306-339 (which assumes the input is
    sorted by time and emits snapshots in order of first appearance).
    """
    data = np.asarray(data)
    if data.size == 0:
        return []
    snapshots: List[np.ndarray] = []
    current: List[np.ndarray] = []
    latest_t = 0
    for row in data:
        t = row[3]
        if latest_t != t:
            latest_t = t
            if current:
                snapshots.append(np.array(current, dtype=np.int64)[:, :3])
            current = []
        current.append(row)
    if current:
        snapshots.append(np.array(current, dtype=np.int64)[:, :3])
    return snapshots


def _relation_context_pairs(triples: np.ndarray, num_rels: int,
                            rc_mode: str = "both"):
    """Unique (relation, entity) incidence pairs including inverse relations.

    rc_mode="both" — parity with ref:rgcn/utils.py:78-97: r_to_e[r] is
    the *set* of entities incident to base-relation-r triples (both
    endpoints), and r+R maps to the same set.

    rc_mode="src" — parity with the HisRES variant's r2e
    (ref:hisres_rgcn/utils.py:71-88), which adds ONLY the source entity
    (`r_to_e[rel].add(src); r_to_e[rel+num_rels].add(src)`, no dst).
    This is the divergence behind the round-3 hisres entity residual:
    the relation-context pool feeding both hisres GRU streams averages
    source entities only, for the forward AND inverse relation ids.
    """
    s, r, o = triples[:, 0], triples[:, 1], triples[:, 2]
    if rc_mode == "src":
        parts = [
            np.stack([r, s], axis=1),
            np.stack([r + num_rels, s], axis=1),
        ]
    elif rc_mode == "both":
        parts = [
            np.stack([r, s], axis=1),
            np.stack([r, o], axis=1),
            np.stack([r + num_rels, s], axis=1),
            np.stack([r + num_rels, o], axis=1),
        ]
    else:
        raise ValueError(f"rc_mode must be 'both' or 'src', got {rc_mode!r}")
    pairs = np.unique(np.concatenate(parts, axis=0), axis=0)
    return pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)


def build_snapshot(
    triples: np.ndarray,
    num_nodes: int,
    num_rels: int,
    edge_pad: int | None = None,
    rc_pad: int | None = None,
    edge_bucket: int = 1024,
    rc_bucket: int = 1024,
    use_native: bool | None = None,
    rc_mode: str = "both",
) -> Snapshot:
    """Build a padded flat-array snapshot graph from [n,3] (s,r,o) triples.

    When the C++ extension (native/graph_builder.cc) is compiled, the hot
    host loop runs natively; ``use_native=False`` forces the numpy path
    (the two are bit-identical — tests/test_native.py).

    ``rc_mode`` selects the relation-context incidence semantics: "both"
    endpoints (baseline r2e) or "src" only (the HisRES variant's r2e) —
    see :func:`_relation_context_pairs`.
    """
    triples = np.asarray(triples)[:, :3].astype(np.int64)
    n = len(triples)

    if use_native is not False:
        from regcn_tpu import native as _native

        if _native.load() is not None:
            E = edge_pad if edge_pad is not None else _round_up(2 * n, edge_bucket)
            M = rc_pad if rc_pad is not None else _round_up(4 * n, rc_bucket)
            try:
                (src, dst, rel, emask, norm, has_in, rc_r, rc_e, rc_m, e, nn) = (
                    _native.build_snapshot_arrays(
                        triples, num_nodes, num_rels, E, M,
                        1 if rc_mode == "src" else 0)
                )
            except _native.StaleNativeError:
                # stale .so demoted by native.build_snapshot_arrays (already
                # logged a rebuild hint); fall through to the numpy path.
                # Other RuntimeErrors are genuine native failures and
                # propagate — silent numpy fallback would hide them.
                if use_native is True:
                    raise
            else:
                return Snapshot(
                    src=src, dst=dst, rel=rel, edge_mask=emask,
                    in_deg_norm=norm, has_in_edge=has_in,
                    rc_rel=rc_r, rc_ent=rc_e, rc_mask=rc_m,
                    num_edges=int(e), num_triples=int(nn),
                    dst_sorted=True,
                )
        elif use_native is True:
            raise RuntimeError("native graph builder requested but not built")
    s, r, o = triples[:, 0], triples[:, 1], triples[:, 2]

    src = np.concatenate([s, o]).astype(np.int32)
    dst = np.concatenate([o, s]).astype(np.int32)
    rel = np.concatenate([r, r + num_rels]).astype(np.int32)
    e = len(src)

    # destination-sort the real edges (stable; padded tail stays last) so
    # the Pallas scatter consumes them without an in-step argsort — the
    # segment-sum path is order-independent, so this is free for XLA
    order = np.argsort(dst, kind="stable")
    src, dst, rel = src[order], dst[order], rel[order]

    in_deg = np.bincount(dst, minlength=num_nodes).astype(np.float32)
    has_in = (in_deg > 0).astype(np.float32)
    in_deg_norm = 1.0 / np.maximum(in_deg, 1.0)

    rc_rel, rc_ent = _relation_context_pairs(triples, num_rels, rc_mode)
    m = len(rc_rel)

    E = edge_pad if edge_pad is not None else _round_up(e, edge_bucket)
    M = rc_pad if rc_pad is not None else _round_up(m, rc_bucket)
    if E < e or M < m:
        raise ValueError(f"padding too small: edges {e}>{E} or rc {m}>{M}")

    def pad(a: np.ndarray, size: int, fill=0):
        out = np.full((size,), fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    edge_mask = np.zeros((E,), np.float32)
    edge_mask[:e] = 1.0
    rc_mask = np.zeros((M,), np.float32)
    rc_mask[:m] = 1.0

    return Snapshot(
        src=pad(src, E),
        dst=pad(dst, E),
        rel=pad(rel, E),
        edge_mask=edge_mask,
        in_deg_norm=in_deg_norm,
        has_in_edge=has_in,
        rc_rel=pad(rc_rel, M),
        rc_ent=pad(rc_ent, M),
        rc_mask=rc_mask,
        num_edges=e,
        num_triples=n,
        dst_sorted=True,
    )


def stack_history(snaps: Sequence[Snapshot]) -> SnapshotBatch:
    """Stack T same-padding snapshots into [T, ...] arrays for lax.scan."""
    if not snaps:
        raise ValueError("empty history")
    fields = {}
    for f in ("src", "dst", "rel", "edge_mask", "in_deg_norm", "has_in_edge",
              "rc_rel", "rc_ent", "rc_mask"):
        fields[f] = np.stack([getattr(sn, f) for sn in snaps], axis=0)
    return Snapshot(
        num_edges=max(sn.num_edges for sn in snaps),
        num_triples=max(sn.num_triples for sn in snaps),
        dst_sorted=all(sn.dst_sorted for sn in snaps),
        **fields,
    )


def build_history(
    snapshots: Sequence[np.ndarray],
    num_nodes: int,
    num_rels: int,
    edge_bucket: int = 1024,
    rc_bucket: int = 1024,
    rc_mode: str = "both",
) -> SnapshotBatch:
    """Build + stack a history window, padding all steps to the window max."""
    sizes_e = [2 * len(t) for t in snapshots]
    sizes_m = []
    built = []
    # First pass to learn rc sizes cheaply: rc pairs <= 4 * triples.
    edge_pad = _round_up(max(sizes_e), edge_bucket)
    rc_pad = _round_up(4 * max(len(t) for t in snapshots), rc_bucket)
    for t in snapshots:
        built.append(
            build_snapshot(t, num_nodes, num_rels, edge_pad=edge_pad,
                           rc_pad=rc_pad, rc_mode=rc_mode)
        )
        sizes_m.append(int(built[-1].rc_mask.sum()))
    return stack_history(built)


def pad_triples(triples: np.ndarray, num_rels: int, bucket: int = 512):
    """Add inverse triples and pad: returns (all_triples [B,3] int32, mask [B]).

    Parity with ref:src/rrgcn.py:209-211 (inverse triples appended with
    relation id shifted by R).
    """
    triples = np.asarray(triples)[:, :3].astype(np.int64)
    inv = triples[:, [2, 1, 0]].copy()
    inv[:, 1] += num_rels
    allt = np.concatenate([triples, inv], axis=0).astype(np.int32)
    b = len(allt)
    B = _round_up(b, bucket)
    out = np.zeros((B, 3), np.int32)
    out[:b] = allt
    mask = np.zeros((B,), np.float32)
    mask[:b] = 1.0
    return out, mask


def dilate_snapshots(snapshots: Sequence[np.ndarray], dilate_len: int) -> List[np.ndarray]:
    """Merge every ``dilate_len`` consecutive snapshots into one (dedup'd).

    Parity with ref:rgcn/utils.py:408-422 (``dilate_input``).
    """
    if dilate_len <= 1:
        return [np.unique(s, axis=0) if False else s for s in snapshots]
    out: List[np.ndarray] = []
    for i in range(0, len(snapshots), dilate_len):
        merged = np.concatenate(snapshots[i : i + dilate_len], axis=0)
        out.append(np.unique(merged, axis=0))
    return out
