"""Masked segment reductions — the sparse-aggregation substrate.

These are the XLA-baseline equivalents of DGL's ``g.update_all(msg,
fn.sum)`` C++/CUDA scatter kernels that the reference delegates to
(ref:rgcn/layers.py:219-220). On TPU a segment-sum lowers to a sorted
scatter-add; the Pallas fast path lives in
:mod:`regcn_tpu.ops.pallas_rgcn`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def masked_segment_sum(
    data: jax.Array, segment_ids: jax.Array, mask: jax.Array, num_segments: int
) -> jax.Array:
    """Segment-sum where padded entries (mask==0) contribute zero."""
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    # accumulate in fp32 (bf16 segment reductions round per-element)
    out = jax.ops.segment_sum(
        (data * m).astype(jnp.float32), segment_ids, num_segments=num_segments)
    return out.astype(data.dtype)


def masked_segment_mean(
    data: jax.Array, segment_ids: jax.Array, mask: jax.Array, num_segments: int
) -> jax.Array:
    """Mean over valid entries per segment; empty segments yield zeros.

    Used for relation-context pooling: parity with the Python span loop at
    ref:src/rrgcn.py:161-166 (mean of incident-entity embeddings per
    relation, zeros for relations absent from the snapshot).
    """
    s = masked_segment_sum(data, segment_ids, mask, num_segments)
    cnt = jax.ops.segment_sum(
        mask.astype(jnp.float32), segment_ids, num_segments=num_segments
    ).astype(data.dtype)
    cnt = cnt.reshape(cnt.shape + (1,) * (s.ndim - cnt.ndim))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)


def segment_softmax(
    logits: jax.Array, segment_ids: jax.Array, mask: jax.Array, num_segments: int
) -> jax.Array:
    """Numerically-stable per-segment softmax over masked entries.

    Needed by the attention encoders (HGAT segment attention, HisRES
    CandRGCN edge softmax — ref:hisres_rgcn/layers.py:106-114) which the
    reference computes with DGL's edge_softmax.
    """
    neg = jnp.finfo(logits.dtype).min
    masked_logits = jnp.where(mask > 0, logits, neg)
    seg_max = jax.ops.segment_max(masked_logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = jnp.exp(masked_logits - seg_max[segment_ids]) * mask
    denom = jax.ops.segment_sum(shifted, segment_ids, num_segments=num_segments)
    return shifted / jnp.maximum(denom[segment_ids], 1e-16)
