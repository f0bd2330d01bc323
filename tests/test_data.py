import numpy as np

from regcn_tpu.data import (
    build_answer_filter,
    build_snapshot,
    build_history,
    dilate_snapshots,
    pad_triples,
    split_by_time,
)
from regcn_tpu.data.synthetic import generate


def test_split_by_time_groups_in_order():
    quads = np.array(
        [[0, 0, 1, 0], [1, 0, 2, 0], [2, 1, 3, 5], [3, 1, 4, 5], [4, 0, 0, 9]]
    )
    snaps = split_by_time(quads)
    assert len(snaps) == 3
    assert snaps[0].shape == (2, 3)
    assert snaps[1].shape == (2, 3)
    np.testing.assert_array_equal(snaps[2], [[4, 0, 0]])


def test_build_snapshot_inverse_edges_and_norm(tiny_graph):
    n, r, triples = tiny_graph
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    e = snap.num_edges
    assert e == 2 * len(triples)
    # canonical storage order is destination-sorted (Snapshot.dst_sorted;
    # lets the Pallas scatter skip its in-step argsort) — compare as an
    # edge SET: forward s->o with rel plus inverse o->s with rel+R
    assert snap.dst_sorted
    assert np.all(np.diff(snap.dst[:e]) >= 0)
    expect_edges = {(int(s), int(rr), int(o)) for s, rr, o in triples}
    expect_edges |= {(int(o), int(rr) + r, int(s)) for s, rr, o in triples}
    got_edges = {(int(snap.src[i]), int(snap.rel[i]), int(snap.dst[i]))
                 for i in range(e)}
    assert got_edges == expect_edges
    # in-degree norm: 1/in_deg with isolated nodes -> 1
    in_deg = np.bincount(snap.dst[:e], minlength=n)
    expected = 1.0 / np.maximum(in_deg, 1)
    np.testing.assert_allclose(snap.in_deg_norm, expected)
    assert snap.edge_mask.sum() == e
    # padding is masked out
    assert snap.edge_mask[e:].sum() == 0


def test_relation_context_pairs_are_unique_sets(tiny_graph):
    n, r, triples = tiny_graph
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    m = int(snap.rc_mask.sum())
    pairs = set(zip(snap.rc_rel[:m].tolist(), snap.rc_ent[:m].tolist()))
    assert len(pairs) == m  # unique
    # every base relation's set equals its inverse relation's set
    from collections import defaultdict

    by_rel = defaultdict(set)
    for rr, ee in pairs:
        by_rel[rr].add(ee)
    for rr in list(by_rel):
        if rr < r:
            assert by_rel[rr] == by_rel[rr + r]
    # check contents directly for one relation
    rel0 = triples[triples[:, 1] == triples[0, 1]]
    expected = set(rel0[:, 0].tolist()) | set(rel0[:, 2].tolist())
    assert by_rel[int(triples[0, 1])] == expected


def test_pad_triples_adds_inverses():
    triples = np.array([[1, 2, 3], [4, 0, 5]])
    out, mask = pad_triples(triples, num_rels=10, bucket=8)
    assert out.shape == (8, 3)
    assert mask.sum() == 4
    np.testing.assert_array_equal(out[2], [3, 12, 1])
    np.testing.assert_array_equal(out[3], [5, 10, 4])


def test_build_history_stacks_uniform_padding():
    snaps = [
        np.array([[0, 0, 1], [1, 1, 2]]),
        np.array([[2, 0, 3]]),
        np.array([[0, 1, 3], [3, 0, 0], [2, 1, 1]]),
    ]
    hist = build_history(snaps, num_nodes=5, num_rels=2, edge_bucket=4, rc_bucket=4)
    assert hist.src.shape[0] == 3  # T
    assert hist.src.shape[1] == hist.dst.shape[1] == 8  # padded to window max bucket
    assert hist.in_deg_norm.shape == (3, 5)


def test_answer_filter_mask_coo():
    snap = np.array([[0, 1, 2], [0, 1, 3], [5, 0, 2]])
    f = build_answer_filter(snap, num_rels=4)
    # query (0,1) target 2: other answer 3 must be masked
    rows, cols = f.mask_coo(np.array([[0, 1]]), np.array([2]))
    assert list(rows) == [0] and list(cols) == [3]
    # inverse key (2, 1+4) exists
    rows, cols = f.mask_coo(np.array([[2, 5]]), np.array([0]))
    assert len(rows) == 0  # 0 is the only answer and it's the target


def test_dilate_snapshots():
    snaps = [np.array([[0, 0, 1]]), np.array([[0, 0, 1], [1, 0, 2]]), np.array([[2, 0, 3]])]
    out = dilate_snapshots(snaps, 2)
    assert len(out) == 2
    assert len(out[0]) == 2  # dedup'd union of first two


def test_synthetic_generator_deterministic_and_temporal():
    d1 = generate("synthetic-small", seed=7)
    d2 = generate("synthetic-small", seed=7)
    np.testing.assert_array_equal(d1.train, d2.train)
    assert d1.num_nodes == 500 and d1.num_rels == 20
    # recurrence: a decent fraction of test facts appeared in train
    train_facts = set(map(tuple, d1.train[:, :3].tolist()))
    test_facts = list(map(tuple, d1.test[:, :3].tolist()))
    recur = sum(1 for f in test_facts if f in train_facts) / len(test_facts)
    assert recur > 0.3, f"temporal recurrence too low: {recur}"


def test_synthetic_static_graph():
    """load_static on synthetic datasets generates an entity-word static
    graph compatible with the --add-static-graph path."""
    from regcn_tpu.data import load_data

    d = load_data("synthetic-small", load_static=True, seed=5)
    assert d.static_triples is not None and len(d.static_triples) > 0
    assert d.num_words > 0 and d.num_static_rels > 0
    assert d.static_triples[:, 0].max() < d.num_nodes
    assert d.static_triples[:, 1].max() < d.num_static_rels
    # word ids offset past entity ids AND contiguous — the convention of
    # load_from_local / ref:src/main.py:147-149 (the reference sizes its
    # static table by len(unique(words)), so gaps would overflow it)
    words = d.static_triples[:, 2] - d.num_nodes
    assert words.min() >= 0
    assert words.max() == len(np.unique(words)) - 1 < d.num_words
    # deterministic per seed
    d2 = load_data("synthetic-small", load_static=True, seed=5)
    np.testing.assert_array_equal(d.static_triples, d2.static_triples)


def test_synthetic_presets_exist():
    from regcn_tpu.data.synthetic import _PRESETS

    for name in ("synthetic-icews14s", "synthetic-icews18", "synthetic-wiki",
                 "synthetic-yago", "synthetic-gdelt", "synthetic-icews05-15"):
        assert name in _PRESETS
    # unknown names must fail loudly, not fall back to synthetic-small
    import pytest

    from regcn_tpu.data.synthetic import generate

    with pytest.raises(KeyError, match="unknown synthetic dataset"):
        generate("synthetic-icews0515")


def test_filtered_rank_tie_density():
    """Tie-convention guard (see train/metrics.py docstring): this
    implementation uses the optimistic rank (1 + #strictly-greater), the
    reference uses sort position — equal only when the target's score is
    tie-free. Assert (a) masked entries can never tie with or beat a
    finite target score, and (b) on a realistic random score matrix the
    target tie density is zero, so the conventions agree."""
    import numpy as np

    from regcn_tpu.train import metrics

    rng = np.random.default_rng(0)
    B, N = 64, 500
    scores = rng.normal(size=(B, N)).astype(np.float32)
    targets = rng.integers(0, N, size=B)

    # (a) FILTER_VALUE sits far below any achievable fp32 score here and
    # never collides with a target score
    tgt = np.take_along_axis(scores, targets[:, None], axis=1)
    assert (tgt > metrics.FILTER_VALUE).all()
    masked = scores.copy()
    rows = np.arange(B).repeat(50)
    cols = rng.integers(0, N, size=50 * B)
    keep = cols != targets.repeat(50)
    masked[rows[keep], cols[keep]] = metrics.FILTER_VALUE
    r = metrics.ranks_from_scores(masked, targets)
    assert (r >= 1).all() and (r <= N).all()

    # (b) tie density at the target: zero on continuous scores, so
    # optimistic rank == sort-position rank
    ties = np.sum(scores == tgt, axis=1) - 1  # excluding the target itself
    assert int(ties.sum()) == 0
    order = np.argsort(-scores, axis=1)
    sort_rank = 1 + np.argmax(order == targets[:, None], axis=1)
    np.testing.assert_array_equal(metrics.ranks_from_scores(scores, targets),
                                  sort_rank)
