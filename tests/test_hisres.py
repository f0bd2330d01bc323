"""HisRES variant tests: history store, cand layer, model, trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.config import TrainConfig
from regcn_tpu.data.snapshots import split_by_time
from regcn_tpu.data.synthetic import generate
from regcn_tpu.hisres.history import HistoryStore
from regcn_tpu.hisres.model import HisResConfig
from regcn_tpu.hisres.train import HisResTrainer, union_snapshots


@pytest.fixture(scope="module")
def tiny_data():
    return generate("synthetic-small", seed=31, num_ents=50, num_rels=4,
                    num_snaps=12, triples_per_snap=30, split=(8, 2, 2))


def test_history_store_semantics():
    snaps = [
        np.array([[0, 0, 1], [2, 1, 3]]),
        np.array([[0, 0, 4]]),
        np.array([[5, 0, 6]]),
    ]
    hs = HistoryStore(num_nodes=8, num_rels=2, history_len=2).build(snaps)
    # at t=2, (0, r=0) has tails {1, 4} from history before t=2
    voc = hs.tail_vocab(np.array([[0, 0, 1]]), t=2)
    assert voc[0, 1] == 1 and voc[0, 4] == 1 and voc[0, 6] == 0
    # inverse direction: (1, r=0+R) -> 0
    voc_inv = hs.tail_vocab(np.array([[1, 2, 0]]), t=1)
    assert voc_inv[0, 0] == 1
    # rel vocab windowed: (0, 1) saw r=0 within last 2 steps of t=2
    rv = hs.rel_vocab(np.array([[0, 0, 1]]), t=2)
    assert rv[0, 0] == 1
    # t=0: no history
    assert hs.tail_vocab(np.array([[0, 0, 1]]), t=0).sum() == 0


def test_history_store_save_load(tmp_path):
    snaps = [np.array([[0, 0, 1]]), np.array([[1, 1, 2]])]
    hs = HistoryStore(5, 2, 2).build(snaps)
    hs.save(str(tmp_path))
    hs2 = HistoryStore.load(str(tmp_path), 5, 2, 2, 2)
    np.testing.assert_array_equal(
        hs.tail_vocab(np.array([[0, 0, 1]]), 1),
        hs2.tail_vocab(np.array([[0, 0, 1]]), 1),
    )


def test_his_graph_edges():
    snaps = [np.array([[0, 0, 1], [0, 0, 2]]), np.array([[3, 1, 4]])]
    hs = HistoryStore(6, 2, 2).build(snaps)
    q = np.array([[0, 0, 2]])
    g = hs.his_graph(q, np.ones(1), t=1, edge_bucket=8)
    # candidates {1, 2} -> edges 0->1, 0->2 (type 0) and 1->0, 2->0 (type 0+R=2)
    e = g.num_edges
    assert e == 4
    pairs = set(zip(g.src[:e].tolist(), g.dst[:e].tolist(), g.rel[:e].tolist()))
    assert (0, 1, 0) in pairs and (0, 2, 0) in pairs
    assert (1, 0, 2) in pairs and (2, 0, 2) in pairs


def test_union_snapshots():
    a = np.array([[0, 0, 1]])
    b = np.array([[0, 0, 1], [1, 1, 2]])
    u = union_snapshots([a, b])
    assert len(u) == 1 and len(u[0]) == 2
    assert len(union_snapshots([a])) == 1


def test_hisres_trainer_end_to_end(tiny_data):
    cfg = HisResConfig(num_ents=tiny_data.num_nodes, num_rels=tiny_data.num_rels,
                       h_dim=16, n_layers=2, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=3, test_history_len=3, n_epochs=1, lr=5e-3)
    trainer = HisResTrainer(cfg, tc, tiny_data, his_edge_bucket=64)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, l0 = trainer.run_epoch(state, 0)
    assert np.isfinite(l0["entity"]) and np.isfinite(l0["relation"])
    state, l1 = trainer.run_epoch(state, 1)
    state, l2 = trainer.run_epoch(state, 2)
    assert l2["entity"] < l0["entity"]
    stats = trainer.evaluate(state, trainer.train_list, trainer.valid_list,
                             time_offset=len(trainer.train_list))
    assert 0 < stats["ent_raw"].mrr <= 1
    assert 0 < stats["rel_raw"].mrr <= 1
