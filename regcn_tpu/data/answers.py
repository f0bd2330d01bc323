"""Filtered-ranking answer structures.

Replaces the reference's per-triple Python-loop filtering
(ref:rgcn/utils.py:51-75 ``filter_score``/``filter_score_r`` and
:286-304 ``load_all_answers_for_time_filter``) with a vectorised design:
per test timestamp we build a flat COO mask — (query_row, candidate)
pairs to squash — that is applied to the whole score matrix in one
scatter instead of B Python iterations.

Semantics preserved: for entity prediction the key is (subject, relation)
with inverse queries keyed by (object, relation+R); the filter removes all
*other* known true answers in the same timestamp's snapshot; the target
itself is kept (ref:rgcn/utils.py:51-61).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class AnswerFilter:
    """Known-answer map for one timestamp: (key1, key2) -> candidate array."""

    ans: Dict[Tuple[int, int], np.ndarray]

    def mask_coo(self, queries: np.ndarray, targets: np.ndarray):
        """COO (rows, cols) of scores to squash for a [B,2] query array.

        The target entry of each row is excluded (its score is kept).
        """
        rows: List[np.ndarray] = []
        cols: List[np.ndarray] = []
        for i, (k1, k2) in enumerate(queries):
            a = self.ans.get((int(k1), int(k2)))
            if a is None:
                continue
            a = a[a != targets[i]]
            if len(a):
                rows.append(np.full(len(a), i, dtype=np.int64))
                cols.append(a)
        if not rows:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return np.concatenate(rows), np.concatenate(cols)


def build_answer_filter(snapshot: np.ndarray, num_rels: int, rel_mode: bool = False) -> AnswerFilter:
    """Build a per-timestamp filter from [n, >=3] (s, r, o) triples.

    rel_mode=False → entity filter: (s, r)->{o} and (o, r+R)->{s}
    (ref:rgcn/utils.py:237-250 via add_subject/add_object).
    rel_mode=True → relation filter: (s, o)->{r} and (o, s)->{r+R}
    (ref:rgcn/utils.py:264-283 with rel_p=True).
    """
    ans: Dict[Tuple[int, int], List[int]] = {}
    for row in snapshot:
        s, r, o = int(row[0]), int(row[1]), int(row[2])
        if rel_mode:
            ans.setdefault((s, o), []).append(r)
            ans.setdefault((o, s), []).append(r + num_rels)
        else:
            ans.setdefault((s, r), []).append(o)
            ans.setdefault((o, r + num_rels), []).append(s)
    return AnswerFilter({k: np.unique(np.asarray(v, dtype=np.int64)) for k, v in ans.items()})


def build_answer_filters_by_time(
    quads: np.ndarray, num_rels: int, rel_mode: bool = False
) -> List[AnswerFilter]:
    """One AnswerFilter per timestamp, in time order.

    Parity with ref:rgcn/utils.py:286-304.
    """
    from regcn_tpu.data.snapshots import split_by_time

    return [build_answer_filter(s, num_rels, rel_mode) for s in split_by_time(quads)]
