"""Vectorized hyperparameter sweep vs sequential training parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.config import ModelConfig, TrainConfig
from regcn_tpu.data.synthetic import generate
from regcn_tpu.train.sweep import SweepRunner


@pytest.fixture(scope="module")
def tiny_data():
    return generate("synthetic-small", seed=17, num_ents=60, num_rels=5,
                    num_snaps=12, triples_per_snap=40, split=(8, 2, 2))


def test_vectorized_sweep_matches_sequential(tiny_data):
    """Each model slice of the K-model sweep must equal an independent
    sequential run with that (lr, task_weight, seed)."""
    from regcn_tpu.data.snapshots import split_by_time
    from regcn_tpu.train.epoch import build_snapshot_store, make_epoch_fn
    from regcn_tpu.train.state import create_train_state

    cfg = ModelConfig(num_ents=tiny_data.num_nodes, num_rels=tiny_data.num_rels,
                      h_dim=16, n_layers=2, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=3, n_epochs=2, lr=1e-3)
    combos = {"lr": [1e-3, 5e-3], "task_weight": [0.7, 0.5], "seed": [0, 1]}
    runner = SweepRunner(cfg, tc, tiny_data, combos)
    results, states = runner.run(n_epochs=2)
    assert len(results) == 2
    for r in results:
        assert 0 < r["valid_ent_mrr_raw"] <= 1

    # sequential comparator for model slice k
    import random as _random

    train_list = split_by_time(tiny_data.train)
    hlen = tc.train_history_len
    store = build_snapshot_store(train_list, tiny_data.num_nodes,
                                 tiny_data.num_rels, edge_bucket=32,
                                 rc_bucket=32, triple_bucket=32, pad_front=hlen)
    for k in range(2):
        tck = dataclasses.replace(tc, lr=combos["lr"][k],
                                  task_weight=combos["task_weight"][k])
        epoch_fn = make_epoch_fn(cfg, tck, pad_front=hlen)
        st = create_train_state(jax.random.PRNGKey(combos["seed"][k]), cfg, tck)
        for epoch in range(2):
            idx = list(range(1, len(train_list)))
            _random.Random(tc.seed + epoch).shuffle(idx)
            st, _ = epoch_fn(st, store, jnp.asarray(np.asarray(idx, np.int32)))
        # vmapped vs sequential compile to different fusion orders (and
        # the unrolled history scan reassociates); drift through 2 epochs
        # of Adam reaches ~6e-5 on O(1) entries
        np.testing.assert_allclose(
            np.asarray(states.params["dynamic_emb"][k]),
            np.asarray(st.params["dynamic_emb"]), atol=2e-4)


def test_hyperbolic_vectorized_sweep(tiny_data):
    """Hyperbolic K-model sweep trains and evaluates; slices differ by lr."""
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.train.sweep import HyperbolicSweepRunner

    cfg = HyperbolicConfig(num_ents=tiny_data.num_nodes,
                           num_rels=tiny_data.num_rels, h_dim=16, n_layers=2)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                     train_history_len=3, n_epochs=2, lr=1e-3)
    runner = HyperbolicSweepRunner(cfg, tc, tiny_data,
                                   {"lr": [1e-3, 1e-2], "seed": [0, 0]})
    results, states = runner.run(n_epochs=2)
    assert len(results) == 2
    for r in results:
        assert 0 < r["valid_ent_mrr_raw"] <= 1
    # different lrs from the same seed must produce different params
    p = np.asarray(states.params["dynamic_emb"])
    assert not np.allclose(p[0], p[1])


def test_sweep_model_axis_sharded_over_data_mesh():
    """grid --vectorize over a (data=8, graph=1) mesh: the 8 models train
    sharded one-per-device and match the unsharded vectorized sweep."""
    import jax

    from regcn_tpu.parallel.mesh import MeshAxes, make_mesh

    data = generate("synthetic-small", seed=9, num_ents=60, num_rels=5,
                    num_snaps=14, triples_per_snap=40, split=(10, 2, 2))
    cfg = ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                      h_dim=16, n_layers=1, dropout=0.0, input_dropout=0.0,
                      hidden_dropout=0.0, feat_dropout=0.0)
    tc = TrainConfig(train_history_len=2, test_history_len=2, edge_bucket=32,
                     rc_bucket=32, triple_bucket=32, n_epochs=1)
    combos = {"lr": [1e-3, 5e-4] * 4, "seed": [1, 2, 3, 4, 5, 6, 7, 8]}

    results = {}
    for name, mesh in (("single", None),
                       ("sharded", make_mesh(MeshAxes(data=8, graph=1)))):
        runner = SweepRunner(cfg, tc, data, dict(combos), mesh=mesh)
        out, states = runner.run()
        if mesh is not None:
            spec = states.params["dynamic_emb"].sharding.spec
            assert spec[0] == "data"
        results[name] = [r["valid_ent_mrr_raw"] for r in out]

    # MRR is rank-based; sharded/unsharded fusion-order drift flips
    # near-ties at this tiny scale
    np.testing.assert_allclose(results["single"], results["sharded"],
                               rtol=5e-3)


def test_sweep_mesh_divisibility_error():
    from regcn_tpu.parallel.mesh import MeshAxes, make_mesh

    data = generate("synthetic-small", seed=9, num_ents=60, num_rels=5,
                    num_snaps=14, triples_per_snap=40, split=(10, 2, 2))
    cfg = ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                      h_dim=16, n_layers=1)
    tc = TrainConfig(train_history_len=2, edge_bucket=32, rc_bucket=32,
                     triple_bucket=32)
    with pytest.raises(ValueError, match="pad the combo list to 8"):
        SweepRunner(cfg, tc, data, {"seed": [1, 2, 3]},
                    mesh=make_mesh(MeshAxes(data=8, graph=1)))
