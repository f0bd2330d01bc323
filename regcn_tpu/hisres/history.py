"""Sparse multi-granularity history store.

Parity with ref:hisres_src/get_new_history.py:99-126 (offline cumulative
sparse history matrices) and their consumption in
ref:hisres_src/hisres_main.py:317-353:

- tail history: cumulative CSR of shape (E * 2R, E) counting how often
  (s, r) -> o appeared at or before each timestamp;
- relation history: per-timestamp CSR (E * E, 2R); queries use the
  windowed difference (last ``history_len`` steps).

Query-conditioned vocabularies are one-hot rows gathered for a batch of
(s, r) / (s, o) keys. The store also emits the padded flat edge arrays
of the query-conditioned history graph directly from the sparse rows
(replacing the reference's per-query Python loop + dense ``todense()``
round trip at ref:hisres_rgcn/utils.py:490-604).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from regcn_tpu.data.snapshots import Snapshot, _round_up


class HistoryStore:
    """Cumulative sparse (s,r)->o and windowed (s,o)->r history."""

    def __init__(self, num_nodes: int, num_rels: int, history_len: int = 3):
        self.num_nodes = num_nodes
        self.num_rels = num_rels  # base R
        self.history_len = history_len
        self.tail_cum: List[sp.csr_matrix] = []  # cumulative, per timestamp
        self.rel_step: List[sp.csr_matrix] = []  # per-timestamp only

    def build(self, snapshot_list: List[np.ndarray]) -> "HistoryStore":
        E, R2 = self.num_nodes, 2 * self.num_rels
        tail_acc = sp.csr_matrix((E * R2, E), dtype=np.float32)
        self.tail_cum, self.rel_step = [], []
        for snap in snapshot_list:
            arr = np.asarray(snap)[:, :3]
            inv = arr[:, [2, 1, 0]].copy()
            inv[:, 1] += self.num_rels
            full = np.concatenate([arr, inv])
            row = full[:, 0] * R2 + full[:, 1]
            data = np.ones(len(row), np.float32)
            tail_acc = tail_acc + sp.csr_matrix(
                (data, (row, full[:, 2])), shape=(E * R2, E)
            )
            self.tail_cum.append(tail_acc.copy())
            rrow = full[:, 0] * E + full[:, 2]
            self.rel_step.append(
                sp.csr_matrix((data, (rrow, full[:, 1])), shape=(E * E, R2))
            )
        return self

    # ------------------------------------------------------------- persist
    def save(self, directory: str):
        """Write per-timestamp npz files (tool parity with get_new_history)."""
        os.makedirs(directory, exist_ok=True)
        for t, m in enumerate(self.tail_cum):
            sp.save_npz(os.path.join(directory, f"tail_history_{t}.npz"), m)
        for t, m in enumerate(self.rel_step):
            sp.save_npz(os.path.join(directory, f"rel_history_{t}.npz"), m)

    @classmethod
    def load(cls, directory: str, num_nodes: int, num_rels: int,
             num_times: int, history_len: int = 3) -> "HistoryStore":
        store = cls(num_nodes, num_rels, history_len)
        for t in range(num_times):
            store.tail_cum.append(
                sp.load_npz(os.path.join(directory, f"tail_history_{t}.npz")))
            store.rel_step.append(
                sp.load_npz(os.path.join(directory, f"rel_history_{t}.npz")))
        return store

    # -------------------------------------------------------------- queries
    def _tail_matrix(self, t: int) -> Optional[sp.csr_matrix]:
        """History strictly before snapshot t (ref main :326-330)."""
        if t <= 0 or not self.tail_cum:
            return None
        return self.tail_cum[min(t - 1, len(self.tail_cum) - 1)]

    def tail_vocab(self, triples: np.ndarray, t: int) -> np.ndarray:
        """One-hot [B, E] of known tails for each (s, r) row (rel ids may
        already include inverses)."""
        B = len(triples)
        out = np.zeros((B, self.num_nodes), np.float32)
        m = self._tail_matrix(t)
        if m is None:
            return out
        idx = triples[:, 0] * (2 * self.num_rels) + triples[:, 1]
        sub = m[idx]
        rows, cols = sub.nonzero()
        out[rows, cols] = 1.0
        return out

    def rel_vocab(self, triples: np.ndarray, t: int) -> np.ndarray:
        """One-hot [B, 2R] of relations seen between (s, o) in the last
        ``history_len`` snapshots before t (ref main :336-350)."""
        R2 = 2 * self.num_rels
        B = len(triples)
        out = np.zeros((B, R2), np.float32)
        lo = max(t - self.history_len, 0)
        if t <= 0 or not self.rel_step:
            return out
        window = self.rel_step[lo:t]
        if not window:
            return out
        acc = window[0].copy()
        for m in window[1:]:
            acc = acc + m
        idx = triples[:, 0] * self.num_nodes + triples[:, 2]
        sub = acc[idx]
        rows, cols = sub.nonzero()
        out[rows, cols] = 1.0
        return out

    # --------------------------------------------------- history graph build
    def his_graph(
        self,
        triples: np.ndarray,  # [B, 3] (query rows; rel in [0, 2R) allowed)
        mask: np.ndarray,  # [B]
        t: int,
        inv: bool = False,
        edge_bucket: int = 1024,
        max_edges: Optional[int] = None,
    ) -> Snapshot:
        """Query-conditioned history graph as padded flat edge arrays.

        For each valid query (s, r): every vocab candidate o adds an edge
        s->o with type r and o->s with type r-R (inv) or r+R (raw)
        (ref:hisres_rgcn/utils.py:540-557). Degree norm = 1/in_deg.
        """
        E = self.num_nodes
        R = self.num_rels
        m = self._tail_matrix(t)
        srcs, dsts, rels = [], [], []
        if m is not None:
            idx = triples[:, 0] * (2 * R) + triples[:, 1]
            sub = m[idx]
            rows, cols = sub.nonzero()
            valid = mask[rows] > 0
            rows, cols = rows[valid], cols[valid]
            s = triples[rows, 0]
            r = triples[rows, 1]
            o = cols
            srcs = [s, o]
            dsts = [o, s]
            rels = [r, r - R if inv else r + R]
        if len(srcs):
            src = np.concatenate(srcs).astype(np.int32)
            dst = np.concatenate(dsts).astype(np.int32)
            rel = np.concatenate(rels).astype(np.int32)
        else:
            src = np.zeros(0, np.int32)
            dst = np.zeros(0, np.int32)
            rel = np.zeros(0, np.int32)
        if max_edges is not None and len(src) > max_edges:
            keep = np.random.default_rng(1234).choice(len(src), max_edges, replace=False)
            src, dst, rel = src[keep], dst[keep], rel[keep]

        e = len(src)
        pad = _round_up(max(e, 1), edge_bucket)
        in_deg = np.bincount(dst, minlength=E).astype(np.float32)

        def p(a):
            out = np.zeros((pad,), a.dtype)
            out[: len(a)] = a
            return out

        emask = np.zeros((pad,), np.float32)
        emask[:e] = 1.0
        return Snapshot(
            src=p(src), dst=p(dst), rel=p(rel), edge_mask=emask,
            in_deg_norm=1.0 / np.maximum(in_deg, 1.0),
            has_in_edge=(in_deg > 0).astype(np.float32),
            rc_rel=np.zeros(1, np.int32), rc_ent=np.zeros(1, np.int32),
            rc_mask=np.zeros(1, np.float32),
            num_edges=e, num_triples=len(triples),
        )
