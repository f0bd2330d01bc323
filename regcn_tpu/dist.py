"""Distributed-aggregation dispatch marker.

``HaloImpl`` is the value threaded through the layer stacks' ``impl``
argument (alongside the strings ``"xla"`` / ``"pallas"``) to select the
explicit shard_map boundary-halo aggregation
(:func:`regcn_tpu.parallel.halo.halo_rgcn_aggregate`) instead of the
dense gather + segment-sum that GSPMD shards implicitly.

It lives in a leaf module (stdlib-only imports) so the model layer
modules can import it without touching the :mod:`regcn_tpu.parallel`
package (which imports the models back for the sharded step builders).
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass(frozen=True)
class HaloImpl:
    """Select boundary-halo shard_map aggregation over ``mesh``.

    Layers receiving this as their ``impl`` require the snapshot pytree
    to carry halo-partitioned edges (``snap.halo``, built by
    :func:`regcn_tpu.parallel.halo.build_halo_store`); they raise at
    trace time if it is absent — no silent fallback.
    """

    mesh: Any  # jax.sharding.Mesh (hashable; kept Any to stay leaf-only)

    def __str__(self) -> str:  # logs / error messages
        return "halo"


def require_halo(snap):
    """The layer-side guard: halo-partitioned edges or a loud error."""
    if snap.halo is None:
        raise ValueError(
            "impl is HaloImpl but the snapshot carries no halo partition; "
            "build the store with halo_shards=mesh size")
    return snap.halo


def check_impl_compatible(impl, dist_agg: str) -> None:
    """Reject conflicting aggregation selections instead of silently
    overriding one (e.g. impl='pallas' together with dist_agg='halo' —
    the boundary halo REPLACES the scatter backend, it does not compose
    with it)."""
    if dist_agg == "halo" and isinstance(impl, str) and impl != "xla":
        raise ValueError(
            f"impl={impl!r} conflicts with dist_agg='halo': the boundary "
            f"halo replaces the aggregation backend; drop --impl or use "
            f"impl='xla'")


def halo_shards(mesh, dist_agg: str):
    """Graph-axis size when the boundary halo is active, else None."""
    if mesh is not None and dist_agg == "halo":
        from regcn_tpu.parallel.mesh import GRAPH_AXIS  # deferred (cycle)

        return mesh.shape[GRAPH_AXIS]
    return None


def attach_history_halo(history, snaps, num_nodes: int, num_rels: int,
                        shards: int, edge_bucket: int = 256):
    """Return ``history`` (a stacked Snapshot window) with boundary-halo
    partitions of the same snapshots attached — the per-step-path
    counterpart of ``build_snapshot_store(halo_shards=...)``."""
    from regcn_tpu.parallel.halo import build_halo_store  # deferred (cycle)

    halo, _ = build_halo_store(list(snaps), num_nodes, num_rels, shards,
                               edge_bucket=edge_bucket)
    return dataclasses.replace(history, halo=halo)
