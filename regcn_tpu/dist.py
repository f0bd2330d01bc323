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
