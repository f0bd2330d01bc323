"""Dataset loading for temporal KGs.

Replaces ref:rgcn/knowledge_graph.py:138-228 (``RGCNLinkDataset`` /
``load_from_local``): reads ``entity2id.txt`` / ``relation2id.txt`` and
``train.txt`` / ``valid.txt`` / ``test.txt`` tab-separated integer files
``s\tr\to\tt`` from ``<data_dir>/<name>/`` into numpy quad arrays.

The reference's dataset tarball is absent from its mount, so this module
also dispatches to a deterministic synthetic TKG generator
(:mod:`regcn_tpu.data.synthetic`) for any dataset name starting with
``synthetic``, so training/benchmarks are reproducible without external
downloads.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class TKGData:
    train: np.ndarray  # [N,4] int64 quads (s, r, o, t)
    valid: np.ndarray
    test: np.ndarray
    num_nodes: int
    num_rels: int
    # optional static entity-word graph triples (s, r, w) for the static
    # constraint loss (ref:src/main.py:145-151)
    static_triples: Optional[np.ndarray] = None
    num_static_rels: int = 0
    num_words: int = 0


def _read_dictionary_size(path: str) -> int:
    """Count ids in an ``<name>\t<id>`` dictionary file."""
    max_id = -1
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                max_id = max(max_id, int(parts[1]))
    return max_id + 1


def _read_quads(path: str, load_time: bool = True) -> np.ndarray:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if load_time:
                rows.append([int(parts[0]), int(parts[1]), int(parts[2]), int(parts[3])])
            else:
                rows.append([int(parts[0]), int(parts[1]), int(parts[2])])
    return np.asarray(rows, dtype=np.int64)


def load_from_local(data_dir: str, name: str, load_static: bool = False) -> TKGData:
    d = os.path.join(data_dir, name)
    num_nodes = _read_dictionary_size(os.path.join(d, "entity2id.txt"))
    num_rels = _read_dictionary_size(os.path.join(d, "relation2id.txt"))
    train = _read_quads(os.path.join(d, "train.txt"))
    valid = _read_quads(os.path.join(d, "valid.txt"))
    test = _read_quads(os.path.join(d, "test.txt"))
    data = TKGData(train=train, valid=valid, test=test, num_nodes=num_nodes, num_rels=num_rels)
    ew_path = os.path.join(d, "e-w-graph.txt")
    if load_static and os.path.exists(ew_path):
        st = _read_quads(ew_path, load_time=False)
        data.num_static_rels = len(np.unique(st[:, 1]))
        data.num_words = len(np.unique(st[:, 2]))
        # word ids are offset past entity ids, as in ref:src/main.py:149
        st = st.copy()
        st[:, 2] += num_nodes
        data.static_triples = st
    return data


def load_data(name: str, data_dir: str = "data", load_static: bool = False, **syn_kwargs) -> TKGData:
    if name.startswith("synthetic"):
        from regcn_tpu.data import synthetic

        return synthetic.generate(name, with_static=load_static, **syn_kwargs)
    return load_from_local(data_dir, name, load_static=load_static)
