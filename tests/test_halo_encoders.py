"""Boundary-halo aggregation for the non-sum hyperbolic encoders.

Round-3 verdict item #1: ``dist_agg='halo'`` previously supported the
``hyperbolic_uvrgcn`` encoder only. The Einstein midpoint
(ref:hyperbolic_layers.py:371-395), Lorentz centroid
(ref:hyperbolic_ops.py:563-581) and HGAT segment softmax
(ref:hyperbolic_layers.py:847-873) are all weighted segment reductions
over DESTINATION segments, so under the destination-partitioned edge
layout they are shard-local and need exactly the same source-row
``all_to_all`` as the sum halo (``parallel/halo.halo_local_aggregate``).
These tests pin layer-level and production-path parity for each.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.config import TrainConfig
from regcn_tpu.data import build_snapshot
from regcn_tpu.data.synthetic import generate
from regcn_tpu.dist import HaloImpl
from regcn_tpu.hyperbolic import layers as HL
from regcn_tpu.parallel.halo import partition_edges_boundary
from regcn_tpu.parallel.mesh import MeshAxes, make_mesh

ENCODERS = ["fhnn", "lgcn", "hgat"]


def _mesh(g):
    return make_mesh(MeshAxes(data=1, graph=g), devices=jax.devices()[:g])


@pytest.fixture(scope="module")
def tiny_data():
    return generate("synthetic-small", seed=3, num_ents=64, num_rels=6,
                    num_snaps=12, triples_per_snap=40, split=(8, 2, 2))


@pytest.mark.parametrize("encoder", ENCODERS)
def test_encoder_cell_halo_matches_dense(rng, tiny_graph, encoder):
    """encoder_cell(impl=HaloImpl) == encoder_cell(impl='xla') per layer
    stack, on a snapshot whose edges cross all 4 shards."""
    n, r, triples = tiny_graph
    d, G, c = 16, 4, 0.01
    mesh = _mesh(G)
    snap = build_snapshot(triples, n, r, edge_bucket=32)
    halo, _ = partition_edges_boundary(triples, n, r, G,
                                       edge_bucket=32, halo_bucket=8)
    snap_halo = dataclasses.replace(snap, halo=halo)

    params = HL.init_encoder_cell(
        jax.random.PRNGKey(0), encoder, d, 2 * r, n_layers=2,
        n_bases=4, num_heads=2)
    from regcn_tpu.hyperbolic import ops as H

    h = H.exp_map_zero(
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)), c)
    rel_emb = jnp.asarray(rng.normal(size=(2 * r, d)).astype(np.float32))

    dense = HL.encoder_cell(params, encoder, h, rel_emb, snap, c,
                            n_bases=4, num_heads=2, impl="xla")
    sharded = HL.encoder_cell(params, encoder, h, rel_emb, snap_halo, c,
                              n_bases=4, num_heads=2, impl=HaloImpl(mesh))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("encoder", ENCODERS)
def test_hyperbolic_trainer_halo_encoder_epoch_and_eval(tiny_data, encoder):
    """HyperbolicTrainer(dist_agg='halo') fused epoch + fused eval parity
    vs unsharded, per encoder (mirrors the uvrgcn production test)."""
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    hcfg = HyperbolicConfig(num_ents=tiny_data.num_nodes,
                            num_rels=tiny_data.num_rels,
                            h_dim=32, n_layers=2, dropout=0.0,
                            encoder=encoder, n_bases=4, num_heads=2)
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
