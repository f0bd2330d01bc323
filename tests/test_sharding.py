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
