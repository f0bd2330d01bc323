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
