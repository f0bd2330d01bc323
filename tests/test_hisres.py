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


def test_hisres_fused_matches_per_step(tiny_data):
    """The fused whole-epoch/whole-split scans (HisResStore) must
    reproduce the per-step path: same losses, params, and eval ranks."""
    from regcn_tpu.data.answers import build_answer_filters_by_time

    cfg = HisResConfig(num_ents=tiny_data.num_nodes, num_rels=tiny_data.num_rels,
                       h_dim=16, n_layers=2, dropout=0.0, input_dropout=0.0,
                       hidden_dropout=0.0, feat_dropout=0.0, cand_dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=3, test_history_len=3, n_epochs=1, lr=5e-3)
    trainer = HisResTrainer(cfg, tc, tiny_data, his_edge_bucket=64)

    # per-step: mirror run_epoch's prefix-then-fused ordering
    import random as _random

    hlen = tc.train_history_len
    idx = list(range(1, len(trainer.train_list)))
    _random.Random(tc.seed + 0).shuffle(idx)
    ordered = [i for i in idx if i < hlen] + [i for i in idx if i >= hlen]
    state_a = trainer.init_state(jax.random.PRNGKey(0))
    losses_a = []
    for i in ordered:
        lo = max(0, i - hlen)
        window = trainer.train_list[lo:i]
        history = trainer._history(window, key=(lo, i))
        history_gg = trainer._history(union_snapshots(window), key=(lo, i, "gg"))
        raw, inv, mask, hg_raw, hg_inv, rel_vocab = trainer._batch(
            trainer.train_list[i], i)
        state_a, losses = trainer.train_step(
            state_a, history, history_gg, raw, inv, mask, hg_raw, hg_inv,
            rel_vocab)
        losses_a.append(float(losses["entity"]))

    state_b = trainer.init_state(jax.random.PRNGKey(0))
    state_b, mean_losses = trainer.run_epoch(state_b, 0)
    np.testing.assert_allclose(mean_losses["entity"], np.mean(losses_a), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state_b.params["dynamic_emb"]),
        np.asarray(state_a.params["dynamic_emb"]), atol=2e-5)

    # eval: fused vs per-step
    ent_f = build_answer_filters_by_time(tiny_data.valid, trainer.num_rels, False)
    rel_f = build_answer_filters_by_time(tiny_data.valid, trainer.num_rels, True)
    t_off = len(trainer.train_list)
    fused = trainer.evaluate(state_b, trainer.train_list, trainer.valid_list,
                             ent_f, rel_f, time_offset=t_off)
    spec = trainer.evaluate(state_b, trainer.train_list, trainer.valid_list,
                            ent_f, rel_f, time_offset=t_off, fused=False)
    for key in fused:
        assert fused[key].count == spec[key].count
        np.testing.assert_allclose(fused[key].mrr, spec[key].mrr, rtol=1e-5)


def test_hisres_multi_step_inference(tiny_data):
    """Multi-step rollout: top-k predictions replace ground truth in the
    window and the history vocab freezes at the last real time
    (ref:hisres_main.py:53-58, :129-137)."""
    cfg = HisResConfig(num_ents=tiny_data.num_nodes, num_rels=tiny_data.num_rels,
                       h_dim=16, n_layers=2, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=3, test_history_len=3, n_epochs=1, lr=5e-3)
    trainer = HisResTrainer(cfg, tc, tiny_data, his_edge_bucket=64)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.run_epoch(state, 0)
    stats = trainer.test(state, multi_step=True, topk=5)
    for key in ("ent_raw", "ent_filter", "rel_raw", "rel_filter"):
        assert np.isfinite(stats[key].mrr) and 0 < stats[key].mrr <= 1


def test_build_time_graph():
    """Periodic timestamp graph (parity: ref:hisres_rgcn/utils.py:408-446)."""
    import numpy as np

    from regcn_tpu.hisres.history import build_time_graph

    g = build_time_graph(10, r_types=[0, 1], periods=[1, 3], num_rels=2)
    # forward edges: 9 of period 1 (rel 0) + 3 of period 3 (rel 1);
    # period-p edges start only at multiples of p (the reference iterates
    # range(0, timestamps, p), ref:hisres_rgcn/utils.py:425)
    assert g.num_triples == 12
    live = g.edge_mask > 0
    edges = set(zip(g.src[live].tolist(), g.rel[live].tolist(),
                    g.dst[live].tolist()))
    assert (0, 0, 1) in edges and (8, 0, 9) in edges
    assert (0, 1, 3) in edges and (6, 1, 9) in edges
    # inverse edges carry rel + num_rels
    assert (1, 2, 0) in edges and (3, 3, 0) in edges
    # in-degree norm: node 0 receives only inverse edges (from 1 and 3)
    assert np.isclose(g.in_deg_norm[0], 0.5)
    # isolated-node clamp: all norms finite and <= 1
    assert np.all(g.in_deg_norm <= 1.0) and np.all(g.in_deg_norm > 0)


def test_hisres_bf16_compute_mode_tracks_fp32(tiny_data):
    """HisRES bf16 compute mode: params stay fp32, loss trajectory within
    a few percent of the fp32 run."""
    from regcn_tpu.config import TrainConfig

    last = {}
    for dt in ("float32", "bfloat16"):
        cfg = HisResConfig(num_ents=tiny_data.num_nodes,
                           num_rels=tiny_data.num_rels, h_dim=16,
                           n_layers=1, dropout=0.0, input_dropout=0.0,
                           hidden_dropout=0.0, feat_dropout=0.0,
                           cand_dropout=0.0, compute_dtype=dt)
        tc = TrainConfig(train_history_len=2, test_history_len=2,
                         edge_bucket=32, rc_bucket=32, triple_bucket=32,
                         seed=5)
        trainer = HisResTrainer(cfg, tc, tiny_data)
        state = trainer.init_state(jax.random.PRNGKey(0))
        losses = []
        for e in range(3):
            state, ls = trainer.run_epoch(state, e)
            losses.append(float(np.mean(np.asarray(ls["entity"]))))
        assert losses[-1] < losses[0]
        assert np.asarray(state.params["dynamic_emb"]).dtype == np.float32
        last[dt] = losses[-1]
    np.testing.assert_allclose(last["bfloat16"], last["float32"], rtol=0.05)


def test_history_store_endpoints_mode():
    """rel_window_mode='endpoints' reproduces the reference's ACTUAL rel
    files: symmetric difference of events at exactly t-1 and t-hlen-1
    (get_new_history.py saves per-step rel matrices that hisres_main
    consumes as if cumulative)."""
    snaps = [
        np.array([[0, 0, 1]]),               # t=0: (0,1) saw r=0
        np.array([[0, 1, 1]]),               # t=1: (0,1) saw r=1
        np.array([[0, 0, 1], [2, 1, 3]]),    # t=2: (0,1) saw r=0 again
        np.array([[4, 0, 5]]),               # t=3
    ]
    hs = HistoryStore(num_nodes=8, num_rels=2, history_len=2,
                      rel_window_mode="endpoints").build(snaps)
    # t=3: endpoints are t-1=2 and t-hlen-1=0. (0,1): r=0 at BOTH -> net 0
    # (cancels, reference masked_fill sees a zero); r=1 at neither.
    rv = hs.rel_vocab(np.array([[0, 0, 1]]), t=3)
    assert rv[0, 0] == 0 and rv[0, 1] == 0
    # (2,3): r=1 at t=2 only -> present
    rv2 = hs.rel_vocab(np.array([[2, 0, 3]]), t=3)
    assert rv2[0, 1] == 1
    # full mode at t=3 window [1,3): (0,1) has r=1 (t=1) and r=0 (t=2)
    hs_full = HistoryStore(num_nodes=8, num_rels=2, history_len=2).build(snaps)
    rvf = hs_full.rel_vocab(np.array([[0, 0, 1]]), t=3)
    assert rvf[0, 0] == 1 and rvf[0, 1] == 1
