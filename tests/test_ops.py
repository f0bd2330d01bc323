import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.data import build_snapshot
from regcn_tpu.ops import (
    masked_segment_mean,
    masked_segment_sum,
    rgcn_aggregate,
    segment_softmax,
)
from regcn_tpu.ops.activations import l2_normalize, rrelu


def test_masked_segment_sum_ignores_padding(rng):
    data = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 3, 10).astype(np.int32))
    mask = jnp.asarray((np.arange(10) < 7).astype(np.float32))
    out = masked_segment_sum(data, seg, mask, 3)
    expected = np.zeros((3, 4), np.float32)
    for i in range(7):
        expected[int(seg[i])] += np.asarray(data)[i]
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_masked_segment_mean_empty_segments_zero(rng):
    data = jnp.ones((4, 2))
    seg = jnp.asarray([0, 0, 2, 2], dtype=jnp.int32)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    out = masked_segment_mean(data, seg, mask, 4)
    np.testing.assert_allclose(out[0], [1.0, 1.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0])  # empty segment
    np.testing.assert_allclose(out[2], [1.0, 1.0])  # one valid entry
    np.testing.assert_allclose(out[3], [0.0, 0.0])


def test_segment_softmax_sums_to_one(rng):
    logits = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, 12).astype(np.int32))
    mask = jnp.asarray((np.arange(12) < 10).astype(np.float32))
    p = segment_softmax(logits, seg, mask, 4)
    sums = jax.ops.segment_sum(p, seg, num_segments=4)
    for s in range(4):
        n_valid = int(((np.asarray(seg) == s) & (np.asarray(mask) > 0)).sum())
        if n_valid:
            np.testing.assert_allclose(sums[s], 1.0, rtol=1e-5)
        else:
            np.testing.assert_allclose(sums[s], 0.0, atol=1e-7)


def _numpy_rgcn_aggregate(h, rel_emb, w, triples, num_rels, n):
    """Independent loop implementation of the UnionRGCN aggregation:
    out[v] = (1/in_deg[v]) * sum_{(u,r,v)} (h[u] + rel[r]) @ W over both
    forward and inverse edges."""
    out = np.zeros_like(h)
    in_deg = np.zeros(n)
    edges = []
    for s, r, o in triples:
        edges.append((s, r, o))
        edges.append((o, r + num_rels, s))
    for u, r, v in edges:
        in_deg[v] += 1
    for u, r, v in edges:
        out[v] += (h[u] + rel_emb[r]) @ w
    norm = 1.0 / np.maximum(in_deg, 1.0)
    return out * norm[:, None]


def test_rgcn_aggregate_matches_numpy_loop(rng, tiny_graph):
    n, r, triples = tiny_graph
    d = 16
    h = rng.normal(size=(n, d)).astype(np.float32)
    rel_emb = rng.normal(size=(2 * r, d)).astype(np.float32)
    w = rng.normal(size=(d, d)).astype(np.float32)
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    out = rgcn_aggregate(
        jnp.asarray(h), jnp.asarray(rel_emb), jnp.asarray(w),
        jnp.asarray(snap.src), jnp.asarray(snap.dst), jnp.asarray(snap.rel),
        jnp.asarray(snap.edge_mask), jnp.asarray(snap.in_deg_norm),
    )
    expected = _numpy_rgcn_aggregate(h, rel_emb, w, triples, r, n)
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_rrelu_eval_is_fixed_slope():
    x = jnp.asarray([-2.0, -1.0, 0.0, 3.0])
    y = rrelu(x, train=False)
    slope = (1 / 8 + 1 / 3) / 2
    np.testing.assert_allclose(y, [-2 * slope, -slope, 0.0, 3.0], rtol=1e-6)


def test_rrelu_train_slope_in_range():
    x = -jnp.ones((1000,))
    y = rrelu(x, jax.random.PRNGKey(0), train=True)
    ratios = -np.asarray(y)
    assert ratios.min() >= 1 / 8 - 1e-6 and ratios.max() <= 1 / 3 + 1e-6
    assert ratios.std() > 0.01  # actually random


def test_l2_normalize():
    x = jnp.asarray([[3.0, 4.0], [0.0, 0.0]])
    y = l2_normalize(x)
    np.testing.assert_allclose(y[0], [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(y[1], [0.0, 0.0])  # zero rows stay finite


def test_pallas_aggregate_preserves_bf16_carry():
    """Regression: the pallas impl returned fp32 under bf16 compute,
    breaking the scan-carry dtype (fp32 accumulate, compute-dtype out)."""
    rng = np.random.default_rng(0)
    n, d, e = 32, 16, 64
    h = jnp.asarray(rng.normal(size=(n, d)), jnp.bfloat16)
    rel_emb = jnp.asarray(rng.normal(size=(8, d)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(d, d)), jnp.bfloat16)
    src = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    dst = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    rel = jnp.asarray(rng.integers(0, 8, e), jnp.int32)
    mask = jnp.ones((e,), jnp.float32)
    norm = jnp.ones((n,), jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        for impl in ("xla", "pallas"):
            out = rgcn_aggregate(h, rel_emb, w, src, dst, rel, mask, norm,
                                 impl=impl)
            assert out.dtype == jnp.bfloat16, impl


def test_rgcn_aggregate_cumsum_matches_xla():
    """impl='cumsum' (sorted-segment cumsum-diff, round-5 roofline
    finding) matches the exact scatter within its documented fp32
    running-sum error; unsorted input is rejected."""
    import numpy as np
    import pytest

    from regcn_tpu.ops.rgcn_scatter import rgcn_aggregate

    rng = np.random.default_rng(0)
    n, d, e, r2 = 300, 32, 4096, 24
    h = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    rel_emb = jnp.asarray(rng.normal(size=(r2, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    # production layout: sorted REAL edges followed by a zero-filled
    # padded tail (build_snapshot's dst_sorted stores) — the pad dst=0
    # breaks global monotonicity, which the impl must handle via the mask
    e_real = e - 512
    src = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    dst_np = np.zeros(e, np.int64)
    dst_np[:e_real] = np.sort(rng.integers(0, n, e_real))
    dst = jnp.asarray(dst_np, jnp.int32)
    rel = jnp.asarray(rng.integers(0, r2, e), jnp.int32)
    mask_np = np.zeros(e, np.float32)
    mask_np[:e_real] = (rng.uniform(size=e_real) > 0.1)
    mask = jnp.asarray(mask_np)
    norm = jnp.asarray(rng.uniform(0.1, 1.0, size=n), jnp.float32)

    ref = rgcn_aggregate(h, rel_emb, w, src, dst, rel, mask, norm, impl="xla")
    out = rgcn_aggregate(h, rel_emb, w, src, dst, rel, mask, norm,
                         impl="cumsum", dst_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)

    with pytest.raises(ValueError, match="sorted"):
        rgcn_aggregate(h, rel_emb, w, src, dst, rel, mask, norm,
                       impl="cumsum", dst_sorted=False)
