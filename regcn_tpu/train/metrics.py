"""Ranking metrics: raw + filtered MRR and Hits@k.

Vectorised replacement for ref:rgcn/utils.py:21-75,136-178
(``sort_and_rank``/``filter_score``/``get_total_rank``/``stat_ranks``):
ranks are computed in one comparison against the target score instead of
a full sort, and the filter is applied as a single COO scatter instead of
a per-triple Python loop.

Tie-handling note: the reference's rank is the target's position after
``torch.sort(descending=True)`` which is arbitrary among equal scores;
here rank = 1 + #(scores strictly greater), the optimistic convention.
With continuous float scores ties are measure-zero, so MRR parity holds.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from regcn_tpu.data.answers import AnswerFilter

FILTER_VALUE = -1e7  # parity with ref:rgcn/utils.py:60


def ranks_from_scores(scores: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """rank[i] = 1 + #{j : scores[i,j] > scores[i,targets[i]]}."""
    tgt = np.take_along_axis(scores, targets[:, None], axis=1)
    return 1 + np.sum(scores > tgt, axis=1).astype(np.int64)


def filtered_ranks(
    scores: np.ndarray,
    queries: np.ndarray,  # [B,2] filter keys
    targets: np.ndarray,  # [B]
    answer_filter: Optional[AnswerFilter],
) -> np.ndarray:
    if answer_filter is None:
        return ranks_from_scores(scores, targets)
    rows, cols = answer_filter.mask_coo(queries, targets)
    if len(rows):
        scores = scores.copy()
        scores[rows, cols] = FILTER_VALUE
    return ranks_from_scores(scores, targets)


def device_ranks(scores, targets):
    """[B] ranks on device: 1 + #(strictly greater). jnp arrays in/out."""
    import jax.numpy as jnp

    tgt = jnp.take_along_axis(scores, targets[:, None], axis=1)
    return 1 + jnp.sum((scores > tgt).astype(jnp.int32), axis=1)


def device_filtered_ranks(scores, targets, mask_rows, mask_cols):
    """Filtered ranks on device; (mask_rows, mask_cols) is a padded COO of
    entries to squash (padding rows out-of-range -> dropped)."""
    import jax.numpy as jnp

    filtered = scores.at[mask_rows, mask_cols].set(FILTER_VALUE, mode="drop")
    return device_ranks(filtered, targets)


def filter_coo_padded(answer_filter, queries, targets, bucket: int = 4096):
    """Host-side padded COO for device filtering; pad rows = B (dropped)."""
    B = len(queries)
    if answer_filter is None:
        rows = np.full(bucket, B, np.int64)
        return rows, np.zeros(bucket, np.int64)
    rows, cols = answer_filter.mask_coo(queries, targets)
    n = len(rows)
    padded = max(((n + bucket - 1) // bucket) * bucket, bucket)
    out_r = np.full(padded, B, np.int64)
    out_c = np.zeros(padded, np.int64)
    out_r[:n] = rows
    out_c[:n] = cols
    return out_r, out_c


@dataclasses.dataclass
class RankStats:
    mrr: float
    hits: Dict[int, float]
    count: int


def stat_ranks(rank_arrays: Sequence[np.ndarray], hits_at=(1, 3, 10)) -> RankStats:
    """Aggregate MRR/Hits over per-snapshot rank arrays (ref:rgcn/utils.py:169-178)."""
    all_ranks = np.concatenate([np.asarray(r) for r in rank_arrays])
    mrr = float(np.mean(1.0 / all_ranks.astype(np.float64)))
    hits = {k: float(np.mean(all_ranks <= k)) for k in hits_at}
    return RankStats(mrr=mrr, hits=hits, count=len(all_ranks))
