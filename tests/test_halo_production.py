"""Boundary-halo aggregation on the PRODUCTION paths.

Round-2 verdict: the halo existed but was reachable only from tests and
the scaling bench. These tests pin it into the trainable surfaces: the
sharded fused epoch (parallel/sharding.py), all three trainers'
``dist_agg='halo'`` mode, the radius-weighted hyperbolic variant, and
the CLI ``--shards/--dist-agg`` flags.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from regcn_tpu.data.snapshots import split_by_time
from regcn_tpu.data.synthetic import generate
from regcn_tpu.parallel.mesh import MeshAxes, make_mesh


@pytest.fixture(scope="module")
def tiny_data():
    return generate("synthetic-small", seed=3, num_ents=64, num_rels=6,
                    num_snaps=12, triples_per_snap=40, split=(8, 2, 2))


def _mesh(g):
    return make_mesh(MeshAxes(data=1, graph=g), devices=jax.devices()[:g])


def test_sharded_epoch_halo_matches_unsharded(tiny_data):
    """make_sharded_epoch_fn(agg='halo') == make_epoch_fn step for step."""
    from regcn_tpu.parallel.sharding import (
        make_sharded_epoch_fn, shard_snapshot_store, state_sharding_rules)
    from regcn_tpu.train.epoch import build_snapshot_store, make_epoch_fn
    from regcn_tpu.train.state import create_train_state

    data = tiny_data
    cfg = ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                      h_dim=32, n_layers=2)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32)
    train_list = split_by_time(data.train)
    hlen = tc.train_history_len
    G = 4
    mesh = _mesh(G)

    store = build_snapshot_store(train_list, data.num_nodes, data.num_rels,
                                 edge_bucket=32, rc_bucket=32,
                                 triple_bucket=32, pad_front=hlen,
                                 halo_shards=G)
    assert store.halo is not None
    order = jnp.arange(1, len(train_list), dtype=jnp.int32)

    epoch_ref = make_epoch_fn(cfg, tc, pad_front=hlen)
    st_ref, losses_ref = epoch_ref(
        create_train_state(jax.random.PRNGKey(0), cfg, tc), store, order)

    epoch_halo = make_sharded_epoch_fn(cfg, tc, mesh, pad_front=hlen,
                                       agg="halo")
    st1 = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    st1 = jax.device_put(st1, state_sharding_rules(st1, mesh))
    st_halo, losses_halo = epoch_halo(
        st1, shard_snapshot_store(store, mesh), order)

    for k in ("entity", "relation"):
        np.testing.assert_allclose(np.asarray(losses_ref[k]),
                                   np.asarray(losses_halo[k]),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_ref.params["dynamic_emb"]),
                               np.asarray(st_halo.params["dynamic_emb"]),
                               rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("dist_agg", ["gspmd", "halo"])
def test_trainer_mesh_fit_matches_unsharded(tiny_data, dist_agg):
    """Trainer(mesh, dist_agg=...) full fit + eval == unsharded."""
    from regcn_tpu.train.loop import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=tiny_data.num_nodes,
                          num_rels=tiny_data.num_rels, h_dim=32, n_layers=2),
        train=TrainConfig(n_epochs=2, lr=5e-3, edge_bucket=32, rc_bucket=32,
                          triple_bucket=32))
    t_ref = Trainer(cfg, tiny_data)
    _, info_ref = t_ref.fit()
    t_mesh = Trainer(cfg, tiny_data, mesh=_mesh(4), dist_agg=dist_agg)
    _, info_mesh = t_mesh.fit()
    assert abs(info_ref["best_valid_mrr_raw"]
               - info_mesh["best_valid_mrr_raw"]) < 2e-3


def test_hyperbolic_trainer_halo_epoch_and_eval(tiny_data):
    """HyperbolicTrainer(dist_agg='halo'): radius-weighted boundary halo
    through the fused epoch + fused eval matches unsharded."""
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    hcfg = HyperbolicConfig(num_ents=tiny_data.num_nodes,
                            num_rels=tiny_data.num_rels,
                            h_dim=32, n_layers=2, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32)
    tr_ref = HyperbolicTrainer(hcfg, tc, tiny_data)
    tr_halo = HyperbolicTrainer(hcfg, tc, tiny_data, mesh=_mesh(4),
                                dist_agg="halo")
    st_ref, l_ref = tr_ref.run_epoch(
        tr_ref.init_state(jax.random.PRNGKey(0)), 0)
    st_halo, l_halo = tr_halo.run_epoch(
        tr_halo.init_state(jax.random.PRNGKey(0)), 0)
    assert abs(l_ref["entity"] - l_halo["entity"]) < 2e-3
    e_ref = tr_ref.evaluate(st_ref, tr_ref.train_list, tr_ref.valid_list)
    e_halo = tr_halo.evaluate(st_halo, tr_halo.train_list, tr_halo.valid_list)
    assert abs(e_ref["ent_raw"].mrr - e_halo["ent_raw"].mrr) < 2e-3


def test_hisres_trainer_halo_epoch(tiny_data):
    """HisResTrainer(dist_agg='halo'): both recurrent streams aggregate
    through the boundary halo; prefix per-step path included."""
    from regcn_tpu.hisres.model import HisResConfig
    from regcn_tpu.hisres.train import HisResTrainer

    rcfg = HisResConfig(num_ents=tiny_data.num_nodes,
                        num_rels=tiny_data.num_rels,
                        h_dim=32, n_layers=1, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32)
    tr_ref = HisResTrainer(rcfg, tc, tiny_data)
    tr_halo = HisResTrainer(rcfg, tc, tiny_data, mesh=_mesh(4),
                            dist_agg="halo")
    _, l_ref = tr_ref.run_epoch(tr_ref.init_state(jax.random.PRNGKey(0)), 0)
    _, l_halo = tr_halo.run_epoch(tr_halo.init_state(jax.random.PRNGKey(0)), 0)
    assert abs(l_ref["entity"] - l_halo["entity"]) < 2e-3


def test_halo_radius_weighted_matches_dense(rng, tiny_graph):
    """halo_rgcn_aggregate with row_scalar/edge_weight hooks == the dense
    radius-weighted tangent message (hyperbolic union layer math)."""
    from regcn_tpu.data import build_snapshot
    from regcn_tpu.hyperbolic import ops as H
    from regcn_tpu.parallel.halo import (
        halo_rgcn_aggregate, partition_edges_boundary)

    n, r, triples = tiny_graph
    d, G, gamma, c = 16, 4, 0.7, 0.01
    mesh = _mesh(G)
    edges, _ = partition_edges_boundary(triples, n, r, G,
                                        edge_bucket=32, halo_bucket=8)
    n_pad = G * edges.rows_per_shard
    v = rng.normal(size=(n_pad, d)).astype(np.float32)
    rel_emb = rng.normal(size=(2 * r, d)).astype(np.float32)
    w = rng.normal(size=(d, d)).astype(np.float32)

    out = halo_rgcn_aggregate(
        mesh, jnp.asarray(v), jnp.asarray(rel_emb), jnp.asarray(w), edges,
        row_scalar_fn=lambda rows: H.radius_from_tangent(rows, c),
        edge_weight_fn=lambda rs, rd: jnp.exp(-gamma * jnp.abs(rs - rd)),
    )

    snap = build_snapshot(triples, n, r, edge_bucket=32)
    vj = jnp.asarray(v[:n])
    radius = H.radius_from_tangent(vj, c)
    msg = (vj[snap.src] + jnp.asarray(rel_emb)[snap.rel]) @ jnp.asarray(w)
    rw = jnp.exp(-gamma * jnp.abs(radius[snap.src] - radius[snap.dst]))
    msg = msg * (rw * jnp.asarray(snap.edge_mask))[:, None]
    agg = jax.ops.segment_sum(msg, jnp.asarray(snap.dst), num_segments=n)
    expected = agg * jnp.asarray(snap.in_deg_norm)[:, None]
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_halo_impl_requires_halo_data(tiny_data):
    """Loud trace-time failure when the snapshot carries no halo."""
    from regcn_tpu.data.snapshots import build_history
    from regcn_tpu.dist import HaloImpl
    from regcn_tpu.models import recurrent

    data = tiny_data
    cfg = ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                      h_dim=16, n_layers=1)
    train_list = split_by_time(data.train)
    history = build_history(train_list[:2], data.num_nodes, data.num_rels,
                            edge_bucket=32, rc_bucket=32)
    params, ms = recurrent.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="no halo"):
        recurrent.evolve(params, cfg, history, impl=HaloImpl(_mesh(2)))


def test_halo_multi_step_eval_matches_unsharded(tiny_data):
    """Round-3 verdict item #6: multi-step inference under
    dist_agg='halo' — the per-step host loop attaches a boundary-halo
    partition to every rebuilt window (incl. the synthetic predicted
    snapshots), so mesh multi-step matches the unsharded path."""
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    hcfg = HyperbolicConfig(num_ents=tiny_data.num_nodes,
                            num_rels=tiny_data.num_rels,
                            h_dim=32, n_layers=1, dropout=0.0)
    tc = TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32)
    tr_ref = HyperbolicTrainer(hcfg, tc, tiny_data)
    tr_halo = HyperbolicTrainer(hcfg, tc, tiny_data, mesh=_mesh(4),
                                dist_agg="halo")
    st_ref = tr_ref.init_state(jax.random.PRNGKey(0))
    st_halo = tr_halo.init_state(jax.random.PRNGKey(0))
    e_ref = tr_ref.evaluate(st_ref, tr_ref.train_list, tr_ref.valid_list,
                            multi_step=True, topk=5)
    e_halo = tr_halo.evaluate(st_halo, tr_halo.train_list,
                              tr_halo.valid_list, multi_step=True, topk=5)
    assert abs(e_ref["ent_raw"].mrr - e_halo["ent_raw"].mrr) < 2e-3


def test_cli_shards_halo_smoke(tmp_path, monkeypatch):
    """--shards/--dist-agg are launchable from the CLI."""
    from regcn_tpu import cli

    monkeypatch.chdir(tmp_path)
    result = cli.main([
        "train", "-d", "synthetic-small", "--n-epochs", "1",
        "--n-hidden", "16", "--train-history-len", "2",
        "--test-history-len", "2", "--shards", "2", "--dist-agg", "halo",
        "--models-dir", str(tmp_path / "models"),
    ])
    assert 0 < result["ent_raw"]["mrr"] <= 1


def test_cli_dist_agg_requires_shards():
    from regcn_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["train", "-d", "synthetic-small", "--dist-agg", "halo"])


def test_halo_rejects_conflicting_impl(tiny_data):
    """impl='pallas' cannot silently combine with dist_agg='halo'."""
    from regcn_tpu.train.loop import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=tiny_data.num_nodes,
                          num_rels=tiny_data.num_rels, h_dim=16, n_layers=1),
        train=TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32))
    with pytest.raises(ValueError, match="conflicts"):
        Trainer(cfg, tiny_data, impl="pallas", mesh=_mesh(2),
                dist_agg="halo")
