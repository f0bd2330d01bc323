"""Entity-classification subsystem (legacy RDF loader parity).

Covers regcn_tpu/data/rdf.py + models/entity_classifier.py against the
reference's legacy stack semantics (ref:rgcn/knowledge_graph.py:25-135,
:231-266, :337-511).
"""

import numpy as np
import pytest

from regcn_tpu.data import rdf


def _tiny():
    # 0→1→2→3→4 chain (relation 0) plus labeled node 0
    triples = np.array([[0, 0, 1], [1, 0, 2], [2, 0, 3], [3, 0, 4]])
    labels = np.full(5, -1, dtype=np.int64)
    labels[0] = 0
    labels[4] = 1
    return rdf._finalize("tiny", 5, 1, triples, labels,
                         np.array([0]), np.array([4]), 2,
                         bfs_level=0, relabel=False)


def test_edge_norm_per_dst_type():
    # two edges of the same type into node 2 → norm 1/2 each
    dst = np.array([2, 2, 3])
    typ = np.array([0, 0, 0])
    norm = rdf.compute_edge_norm(dst, typ)
    assert np.allclose(norm, [0.5, 0.5, 1.0])
    # same dst, different types → separate counts (ref :128-131)
    norm2 = rdf.compute_edge_norm(np.array([2, 2]), np.array([0, 1]))
    assert np.allclose(norm2, [1.0, 1.0])


def test_bfs_levels_directed():
    # directed chain 0→1→2→3; from root {0} depth 2 reaches {0,1,2}
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    keep = rdf.bfs_levels(4, src, dst, np.array([0]), depth=2)
    assert keep.tolist() == [True, True, True, False]


def test_bfs_prune_vs_loop_spec():
    rng = np.random.default_rng(0)
    n, e = 40, 120
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    typ = rng.integers(0, 3, e)
    labels = np.full(n, -1, dtype=np.int64)
    roots = rng.choice(n, 4, replace=False)
    labels[roots] = 0
    data = rdf.EntityClassData(
        name="t", num_nodes=n, num_rels=3, num_classes=1,
        edge_src=src, edge_dst=dst, edge_type=typ,
        edge_norm=rdf.compute_edge_norm(dst, typ), labels=labels,
        train_idx=roots[:2], test_idx=roots[2:])
    pruned = rdf.bfs_prune(data, bfs_level=2)

    # loop spec of ref:rgcn/knowledge_graph.py:248-266 + :100-113
    lvls = [set(roots.tolist())]
    visited = set(roots.tolist())
    for _ in range(2):
        nxt = {int(d) for s, d in zip(src, dst) if s in lvls[-1]} - visited
        visited |= nxt
        lvls.append(nxt)
    keep = set.union(*lvls)
    expect = [(s, d, t) for s, d, t in zip(src, dst, typ)
              if s in keep and d in keep]
    got = list(zip(pruned.edge_src.tolist(), pruned.edge_dst.tolist(),
                   pruned.edge_type.tolist()))
    assert sorted(got) == sorted(expect)


def test_relabel_compacts_ids():
    data = _tiny()
    pruned = rdf.bfs_prune(data, bfs_level=1, relabel=True)
    # BFS runs over the final edge set (fwd + inverse + self, as the
    # reference BFSes its cached edge list): from labeled {0,4} one hop
    # reaches {1} (0→1) and {3} (4→3 inverse); node 2 is dropped and ids
    # are compacted 0,1,3,4 → 0,1,2,3
    assert pruned.num_nodes == 4
    assert 2 not in (set(pruned.edge_src.tolist()) | set(pruned.edge_dst.tolist())) \
        or pruned.labels[2] == -1
    assert pruned.labels.tolist() == [0, -1, -1, 1]
    assert pruned.train_idx.tolist() == [0] and pruned.test_idx.tolist() == [3]


def test_finalize_adds_inverse_and_self():
    data = _tiny()
    assert data.num_rels == 3  # 2R+1 with R=1 (ref :420)
    e = len(data.edge_src)
    assert e == 4 + 4 + 5  # fwd + inverse + self loops
    self_edges = data.edge_type == 2
    assert np.all(data.edge_src[self_edges] == data.edge_dst[self_edges])


def test_npz_artifact_roundtrip(tmp_path):
    # write the reference cache layout (ref :369-399) and load it back
    d = tmp_path / "toy"
    d.mkdir()
    gen = rdf.generate_entity_class("synthetic-entity-small", seed=7,
                                    bfs_level=0)
    edges = np.stack([gen.edge_src, gen.edge_dst, gen.edge_type], axis=1)
    np.savez(d / "edges.npz", edges=edges, n=gen.num_nodes, nrel=gen.num_rels)
    onehot = np.zeros((gen.num_nodes, gen.num_classes), np.float32)
    lab = gen.labels >= 0
    onehot[np.where(lab)[0], gen.labels[lab]] = 1.0
    np.savez(d / "labels.npz", labels=onehot)
    np.save(d / "train_idx.npy", gen.train_idx)
    np.save(d / "test_idx.npy", gen.test_idx)

    back = rdf.load_entity_data("toy", data_dir=str(tmp_path), bfs_level=0)
    assert back.num_nodes == gen.num_nodes
    assert back.num_classes == gen.num_classes
    np.testing.assert_array_equal(back.edge_src, gen.edge_src)
    np.testing.assert_array_equal(back.labels, gen.labels)
    np.testing.assert_allclose(back.edge_norm, gen.edge_norm)


def test_classifier_learns_synthetic():
    import jax

    from regcn_tpu.models import entity_classifier as ec

    data = rdf.generate_entity_class("synthetic-entity-small", seed=3)
    cfg = ec.EntityClassifierConfig(h_dim=16, n_bases=4, n_epochs=60)
    params, losses = ec.fit(jax.random.PRNGKey(0), data, cfg)
    assert float(losses[-1]) < float(losses[0])
    acc = ec.evaluate(params, data, cfg)
    # class signal is structural (class hubs); chance = 0.25
    assert acc > 0.85, acc
