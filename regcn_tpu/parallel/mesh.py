"""Device-mesh construction.

The reference has no distributed support of any kind (SURVEY.md §2.5);
this is a new TPU-native design: a 2-D logical mesh

    ("data", "graph")

where the ``graph`` axis shards the entity dimension (embedding tables,
evolved entity states, decoder candidate axis) and ``data`` replicates /
batches independent work (snapshot windows, grid-search trials).
Collectives ride ICI within a slice; XLA inserts them from sharding
annotations (GSPMD), with shard_map halo-exchange kernels on the
performance path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: int = 1
    graph: int = 1


def make_mesh(
    axes: Optional[MeshAxes] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = MeshAxes(data=1, graph=len(devices))
    n = axes.data * axes.graph
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(axes.data, axes.graph)
    return Mesh(dev_array, (DATA_AXIS, GRAPH_AXIS))


def check_entity_divisibility(num_ents: int, mesh: Mesh) -> None:
    """Row-exact entity sharding requires num_ents % graph_size == 0.

    Raised early with an actionable message instead of XLA's generic
    divisibility error. Datasets whose entity count is not a multiple of
    the mesh should pad the id space with inert entities (never appearing
    in any triple); note padded ids DO participate in full-candidate
    scoring, so also extend filter/answer masks if exact MRR parity with
    the unpadded run is required.
    """
    g = mesh.shape[GRAPH_AXIS]
    if num_ents % g != 0:
        raise ValueError(
            f"num_ents={num_ents} is not divisible by the '{GRAPH_AXIS}' "
            f"mesh axis ({g}); pad the entity id space to "
            f"{((num_ents + g - 1) // g) * g} (see docstring)")
