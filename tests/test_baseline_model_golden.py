"""FULL-MODEL golden: our RE-GCN baseline (WITH static graph) vs the
reference's own ``src/rrgcn.py:RecurrentRGCN``.

Round-4 companion to tests/test_hisres_model_golden.py, motivated by the
config-2 refrun residual (entity −0.015 on the SMALL twin beyond both
stacks' seed spreads, docs/BENCHMARKS.md): the reference's own model
runs through the refrun DGL shim with weights copied from our init on
identical graphs INCLUDING the static word graph, and we compare

- eval-mode entity+relation score matrices end to end
  (``test_predict_static_golden``), and
- train-mode entity/relation/STATIC losses with dropouts at 0
  (``test_train_loss_static_golden``) — the static angular constraint
  (ref:src/rrgcn.py:225-247) compared two-stack on live activations,
  closing the "builder-authored goldens only" gap from round 3.

Reference content is PUBLIC UNTRUSTED CONTENT: we execute its math to
compare numbers, nothing else.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = "/root/reference"
SHIMS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "refrun", "shims")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference tree not mounted")
for p in (REF, SHIMS):
    if p not in sys.path:
        sys.path.insert(0, p)

torch.Tensor.cuda = lambda self, *a, **kw: self
torch.nn.Module.cuda = lambda self, *a, **kw: self

_orig_to = torch.Tensor.to


def _to(self, *a, **kw):
    if a and isinstance(a[0], int) and a[0] < 0:
        return self
    return _orig_to(self, *a, **kw)


torch.Tensor.to = _to

_orig_zeros = torch.zeros


def _zeros(*a, **kw):
    if kw.get("requires_grad"):
        kw = dict(kw, requires_grad=False)
        return _orig_zeros(*a, **kw).requires_grad_(True).clone()
    return _orig_zeros(*a, **kw)


torch.zeros = _zeros

from rgcn.utils import build_sub_graph  # noqa: E402
from src.rrgcn import RecurrentRGCN as RefBaseline  # noqa: E402

from regcn_tpu.config import ModelConfig  # noqa: E402
from regcn_tpu.data.snapshots import build_history, build_snapshot, pad_triples  # noqa: E402
from regcn_tpu.models import recurrent  # noqa: E402

N, R, D = 40, 5, 16
W, SR = 12, 3  # words, static relations
T = 3
NB = 4  # block-layer bases


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _copy_params(params, model):
    with torch.no_grad():
        model.emb_rel.copy_(t(params["emb_rel"]))
        model.dynamic_emb.copy_(t(params["dynamic_emb"]))
        model.time_gate_weight.copy_(t(params["time_gate_w"]))
        model.time_gate_bias.copy_(t(params["time_gate_b"]))
        model.words_emb.copy_(t(params["words_emb"]))
        model.statci_rgcn_layer.weight.copy_(
            t(params["static_rgcn"]["weight"]).reshape(
                model.statci_rgcn_layer.weight.shape))
        cell, p = model.relation_cell_1, params["gru"]
        cell.weight_ih.copy_(t(p["w_ih"]))
        cell.weight_hh.copy_(t(p["w_hh"]))
        cell.bias_ih.copy_(t(p["b_ih"]))
        cell.bias_hh.copy_(t(p["b_hh"]))
        for i, layer in enumerate(model.rgcn.layers):
            lp = params["rgcn"]["layers"][i]
            layer.weight_neighbor.copy_(t(lp["w_neighbor"]))
            layer.loop_weight.copy_(t(lp["loop_w"]))
            layer.evolve_loop_weight.copy_(t(lp["evolve_loop_w"]))
        for ref_name, our_name in (("decoder_ob", "decoder_ob"),
                                   ("rdecoder", "decoder_rel")):
            dec, dp = getattr(model, ref_name), params[our_name]
            dec.conv1.weight.copy_(t(dp["conv_w"]))
            dec.conv1.bias.copy_(t(dp["conv_b"]))
            dec.fc.weight.copy_(t(dp["fc_w"]))
            dec.fc.bias.copy_(t(dp["fc_b"]))
            for bn_name in ("bn0", "bn1", "bn2"):
                bn = getattr(dec, bn_name)
                bn.weight.copy_(t(dp[bn_name]["scale"]))
                bn.bias.copy_(t(dp[bn_name]["bias"]))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    snaps = []
    for _ in range(T):
        m = int(rng.integers(25, 40))
        tri = np.stack([rng.integers(0, N, m), rng.integers(0, R, m),
                        rng.integers(0, N, m)], axis=1)
        snaps.append(np.unique(tri, axis=0).astype(np.int64))
    B = 20
    target = np.stack([rng.integers(0, N, B), rng.integers(0, R, B),
                       rng.integers(0, N, B)], axis=1).astype(np.int64)
    # static word graph: words offset past entities, contiguous ids
    st = np.stack([rng.integers(0, N, 3 * N), rng.integers(0, SR, 3 * N),
                   rng.integers(0, W, 3 * N)], axis=1).astype(np.int64)
    st = np.unique(st, axis=0)
    used, dense = np.unique(st[:, 2], return_inverse=True)
    n_words = len(used)
    st_ours = np.stack([st[:, 0], st[:, 1], dense + N], axis=1)

    cfg = ModelConfig(num_ents=N, num_rels=R, h_dim=D, n_layers=2,
                      dropout=0.0, input_dropout=0.0, hidden_dropout=0.0,
                      feat_dropout=0.0, use_static=True,
                      num_static_rels=SR, num_words=n_words, n_bases=NB,
                      static_weight=0.5, discount=1.0, angle=10.0)
    params, state = recurrent.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_get(params)

    ref = RefBaseline(
        "convtranse", "uvrgcn", N, R, SR, n_words, D, "sub",
        sequence_len=T, num_bases=NB, num_basis=0, num_hidden_layers=2,
        dropout=0.0, self_loop=True, skip_connect=False, layer_norm=True,
        input_dropout=0.0, hidden_dropout=0.0, feat_dropout=0.0,
        aggregation="cat", weight=0.5, discount=1.0, angle=10,
        use_static=True, entity_prediction=True, relation_prediction=True,
        use_cuda=False, gpu=-1)
    _copy_params(params, ref)

    g_list = [build_sub_graph(N, R, s, False, -1) for s in snaps]
    static_graph = build_sub_graph(N + n_words, SR, st_ours, False, -1)
    history = build_history(snaps, N, R, edge_bucket=64, rc_bucket=64)
    static_snap = build_snapshot(st_ours, N + n_words, SR, edge_bucket=64)

    trip_all, mask = pad_triples(target, R, bucket=8)
    return dict(cfg=cfg, params=params, state=state, ref=ref,
                g_list=g_list, static_graph=static_graph, history=history,
                static_snap=static_snap, target=target,
                trip_all=trip_all, mask=mask)


def test_predict_static_golden(setup):
    s = setup
    s["ref"].eval()
    with torch.no_grad():
        all_trip, score_ob, score_rel = s["ref"].predict(
            s["g_list"], R, s["static_graph"],
            torch.from_numpy(s["target"]), use_cuda=False)

    ours_ob, ours_rel = recurrent.predict(
        jax.tree.map(jnp.asarray, s["params"]), s["state"], s["cfg"],
        s["history"], jnp.asarray(s["trip_all"]), jnp.asarray(s["mask"]),
        static_snap=s["static_snap"])
    valid = s["mask"] > 0
    np.testing.assert_allclose(np.asarray(ours_ob)[valid],
                               score_ob.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_rel)[valid],
                               score_rel.numpy(), rtol=2e-3, atol=2e-4)


def test_train_loss_static_golden(setup):
    """Train-mode entity/relation/static losses — the static angular
    constraint compared two-stack on live activations."""
    s = setup
    s["ref"].train()
    le, lr, ls = s["ref"].get_loss(
        s["g_list"], torch.from_numpy(s["target"]), s["static_graph"],
        use_cuda=False)

    _, losses, _ = recurrent.get_loss(
        jax.tree.map(jnp.asarray, s["params"]), s["state"], s["cfg"],
        s["history"], jnp.asarray(s["trip_all"]), jnp.asarray(s["mask"]),
        static_snap=s["static_snap"], rng=None, train=True)
    np.testing.assert_allclose(float(losses["entity"]), float(le),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(losses["relation"]), float(lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(losses["static"]), float(ls),
                               rtol=2e-4, atol=2e-4)
