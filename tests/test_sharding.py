"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.config import ModelConfig, TrainConfig
from regcn_tpu.data import build_history, pad_triples
from regcn_tpu.data.synthetic import generate
from regcn_tpu.parallel import make_mesh, make_sharded_train_step
from regcn_tpu.parallel.mesh import MeshAxes


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(MeshAxes(data=1, graph=8))


def _tiny_problem():
    data = generate("synthetic-small", seed=11, num_ents=64, num_rels=6,
                    num_snaps=12, triples_per_snap=40, split=(8, 2, 2))
    cfg = ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                      h_dim=16, n_layers=2)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32)
    from regcn_tpu.data.snapshots import split_by_time

    train_list = split_by_time(data.train)
    history = build_history(train_list[:3], data.num_nodes, data.num_rels,
                            edge_bucket=32, rc_bucket=32)
    triples, mask = pad_triples(train_list[3], data.num_rels, 32)
    return cfg, tc, history, triples, mask


def test_sharded_train_step_runs_and_shards_entities(mesh):
    cfg, tc, history, triples, mask = _tiny_problem()
    init_fn, train_step, predict_step = make_sharded_train_step(cfg, tc, mesh)
    state = init_fn(jax.random.PRNGKey(0))
    # the entity table must actually be sharded over the graph axis
    emb_sharding = state.params["dynamic_emb"].sharding
    assert emb_sharding.spec[0] == "graph"
    state, losses = train_step(state, history, triples, mask)
    assert np.isfinite(float(losses["entity"]))
    scores_ob, scores_rel = predict_step(state, history, triples, mask)
    assert scores_ob.shape == (len(triples), cfg.num_ents)


def test_sharded_matches_single_device():
    """The sharded step must be numerically identical to single-device."""
    cfg, tc, history, triples, mask = _tiny_problem()
    mesh8 = make_mesh(MeshAxes(data=1, graph=8))
    mesh1 = make_mesh(MeshAxes(data=1, graph=1), devices=jax.devices()[:1])

    outs = []
    for mesh in (mesh1, mesh8):
        init_fn, train_step, _ = make_sharded_train_step(cfg, tc, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, losses = train_step(state, history, triples, mask)
        outs.append(
            (np.asarray(state.params["dynamic_emb"]), float(losses["entity"]))
        )
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4, atol=1e-5)


def test_sharded_fused_epoch_matches_unsharded(mesh):
    """The fused whole-epoch scan under GSPMD entity sharding must match
    the single-device fused epoch (same losses and final params)."""
    from regcn_tpu.data.snapshots import split_by_time
    from regcn_tpu.parallel.sharding import (
        make_sharded_epoch_fn, shard_snapshot_store, state_sharding_rules)
    from regcn_tpu.train.epoch import build_snapshot_store, make_epoch_fn
    from regcn_tpu.train.state import create_train_state

    data = generate("synthetic-small", seed=11, num_ents=64, num_rels=6,
                    num_snaps=12, triples_per_snap=40, split=(8, 2, 2))
    cfg = ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                      h_dim=16, n_layers=2, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=3)
    train_list = split_by_time(data.train)
    hlen = tc.train_history_len
    store = build_snapshot_store(train_list, data.num_nodes, data.num_rels,
                                 edge_bucket=32, rc_bucket=32,
                                 triple_bucket=32, pad_front=hlen)
    order = jnp.asarray(np.arange(1, len(train_list), dtype=np.int32))

    ref_epoch = make_epoch_fn(cfg, tc, pad_front=hlen)
    state = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    state_ref, losses_ref = ref_epoch(state, store, order)

    sharded_epoch = make_sharded_epoch_fn(cfg, tc, mesh, pad_front=hlen)
    state2 = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    state2 = jax.device_put(state2, state_sharding_rules(state2, mesh))
    store_sh = shard_snapshot_store(store, mesh)
    state_sh, losses_sh = sharded_epoch(state2, store_sh, order)

    assert state_sh.params["dynamic_emb"].sharding.spec[0] == "graph"
    np.testing.assert_allclose(
        np.asarray(losses_sh["entity"]), np.asarray(losses_ref["entity"]),
        rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_sh.params["dynamic_emb"]),
        np.asarray(state_ref.params["dynamic_emb"]), atol=2e-5)


def test_hyperbolic_sharded_fused_epoch_matches_unsharded():
    """HyperbolicTrainer(mesh=...): the flagship family's fused epoch runs
    row-sharded over the graph axis, numerically matching the unsharded
    run; the entity table stays sharded across the whole-epoch scan."""
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = generate("synthetic-small", seed=11, num_ents=64, num_rels=5,
                    num_snaps=12, triples_per_snap=30, split=(8, 2, 2))
    cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                           h_dim=16, n_layers=1, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=2, test_history_len=2, lr=5e-3)

    results = {}
    for name, mesh in (("single", None),
                       ("sharded", make_mesh(MeshAxes(data=1, graph=8)))):
        trainer = HyperbolicTrainer(cfg, tc, data, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        if mesh is not None:
            assert state.params["dynamic_emb"].sharding.spec[0] == "graph"
        losses = []
        for e in range(2):
            state, ls = trainer.run_epoch(state, e)
            losses.append(ls["entity"])
        if mesh is not None:
            assert state.params["dynamic_emb"].sharding.spec[0] == "graph"
        # fused whole-split eval with the (sharded) state: GSPMD
        # propagates the entity sharding into predict + ranking
        stats = trainer.evaluate_fused(state, trainer.train_list,
                                       trainer.valid_list, cache_key="v")
        results[name] = (np.asarray(state.params["dynamic_emb"],
                                    dtype=np.float32), losses,
                         stats["ent_raw"].mrr)

    # sharded reductions (segment-sum shards + psum'd logsumexp) change
    # summation order; drift compounds across the 2nd epoch's steps
    np.testing.assert_allclose(results["single"][1], results["sharded"][1],
                               rtol=2e-3)
    # MRR is rank-based: tiny param drift flips near-ties at this scale
    np.testing.assert_allclose(results["single"][2], results["sharded"][2],
                               rtol=2e-2)
    # Adam's 1/sqrt(v) amplifies tiny grad drift for near-zero entries;
    # compare absolutely (entries are O(1); a handful of entries reach
    # ~6e-3 after 2 epochs x 7 steps of reassociation drift)
    np.testing.assert_allclose(results["single"][0], results["sharded"][0],
                               atol=1e-2)


def test_hisres_sharded_fused_epoch_matches_unsharded():
    """HisResTrainer(mesh=...): two-stream fused epoch runs entity-sharded
    and matches the single-device run."""
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hisres.model import HisResConfig
    from regcn_tpu.hisres.train import HisResTrainer

    # entity count must divide the graph axis (shardings are row-exact)
    data = generate("synthetic-small", seed=31, num_ents=64, num_rels=4,
                    num_snaps=12, triples_per_snap=30, split=(8, 2, 2))
    cfg = HisResConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                       h_dim=16, n_layers=1, dropout=0.0, input_dropout=0.0,
                       hidden_dropout=0.0, feat_dropout=0.0, cand_dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=2, test_history_len=2, seed=5)

    results = {}
    for name, mesh in (("single", None),
                       ("sharded", make_mesh(MeshAxes(data=1, graph=8)))):
        trainer = HisResTrainer(cfg, tc, data, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        if mesh is not None:
            assert state.params["dynamic_emb"].sharding.spec[0] == "graph"
        losses = []
        for e in range(2):
            state, ls = trainer.run_epoch(state, e)
            losses.append(ls["entity"])
        if mesh is not None:
            assert state.params["dynamic_emb"].sharding.spec[0] == "graph"
        results[name] = (np.asarray(state.params["dynamic_emb"],
                                    dtype=np.float32), losses)

    np.testing.assert_allclose(results["single"][1], results["sharded"][1],
                               rtol=2e-3)
    np.testing.assert_allclose(results["single"][0], results["sharded"][0],
                               atol=5e-3)


def test_entity_divisibility_error_is_actionable():
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = generate("synthetic-small", seed=31, num_ents=50, num_rels=4,
                    num_snaps=12, triples_per_snap=30, split=(8, 2, 2))
    cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                           h_dim=16, n_layers=1)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32)
    with pytest.raises(ValueError, match="pad the entity id space to 56"):
        HyperbolicTrainer(cfg, tc, data,
                          mesh=make_mesh(MeshAxes(data=1, graph=8)))
