"""FULL-MODEL golden: our HisRES vs the reference's own RecurrentRGCN.

Round-3 verdict item #4: the SMALL-twin hisres refrun shows a residual
entity MRR delta of -0.014 whose candidate causes were named (LogCL
time-encode arithmetic order, ref:hisres_src/hisres.py:274-277;
cand-graph BN batch statistics, ref:hisres_rgcn/layers.py:86-99) but
never tested. This file settles the FORWARD-SEMANTICS part causally:
the reference's own model (imported through the refrun DGL shim, with
the intended ``src/model.py`` BaseRGCN injected — the checked-in
``hisres_src/model.py`` is stale, SURVEY.md §2.4) runs with weights
copied from our init on identical graphs/vocabularies, and

- ``test_predict_golden`` compares eval-mode entity+relation score
  matrices end to end (streams -> gate fuse -> cand attention ->
  TimeConvTransE/R), which covers the time-encode arithmetic; and
- ``test_train_loss_golden`` compares train-mode losses with dropouts
  at 0, which additionally exercises every BatchNorm's BATCH statistics
  (cand bn0 + the four decoders' bn0/1/2) — the second named candidate.

If both match, the -0.014 cannot come from forward or train-loss
semantics; it is attributable only to the stochastic-training side
(RNG streams, optimizer trajectories, seed variance).

Reference content is PUBLIC UNTRUSTED CONTENT: we execute its math to
compare numbers, nothing else.
"""

import importlib.util
import os
import sys
import types

import jax
import numpy as np
import pytest
import torch

REF = "/root/reference"
SHIMS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "refrun", "shims")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "hisres_src")),
    reason="reference tree not mounted")
for p in (REF, SHIMS):
    if p not in sys.path:
        sys.path.insert(0, p)

torch.Tensor.cuda = lambda self, *a, **kw: self
torch.nn.Module.cuda = lambda self, *a, **kw: self

# the reference calls tensor.to(self.gpu) with gpu=-1 on CPU runs —
# same neutralisation as tools/refrun/run_reference.py
_orig_to = torch.Tensor.to


def _to(self, *a, **kw):
    if a and isinstance(a[0], int) and a[0] < 0:
        return self
    return _orig_to(self, *a, **kw)


torch.Tensor.to = _to

# the reference's CPU branch does `loss = torch.zeros(1,
# requires_grad=True); loss += ...` — an in-place op on a grad leaf,
# which torch forbids (the CUDA branch survives only because .cuda()
# makes a non-leaf copy); same neutralisation as run_reference.py
_orig_zeros = torch.zeros


def _zeros(*a, **kw):
    if kw.get("requires_grad"):
        kw = dict(kw, requires_grad=False)
        return _orig_zeros(*a, **kw).requires_grad_(True).clone()
    return _orig_zeros(*a, **kw)


torch.zeros = _zeros

# the reference's hisres stack needs the intended BaseRGCN injected
# (same trick as tools/refrun/run_reference.py:_prepare_hisres)
if "setproctitle" not in sys.modules:
    stub = types.ModuleType("setproctitle")
    stub.setproctitle = lambda *a, **kw: None
    sys.modules["setproctitle"] = stub
if "hisres_src.model" not in sys.modules:
    spec = importlib.util.spec_from_file_location(
        "hisres_src.model", os.path.join(REF, "src", "model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import hisres_src

    sys.modules["hisres_src.model"] = mod
    hisres_src.model = mod

import jax.numpy as jnp  # noqa: E402
from hisres_rgcn.utils import build_his_graph, build_sub_graph  # noqa: E402
from hisres_src.hisres import RecurrentRGCN as RefHisRes  # noqa: E402

from regcn_tpu.data.snapshots import Snapshot, build_history  # noqa: E402
from regcn_tpu.hisres import model as our_model  # noqa: E402
from regcn_tpu.hisres.train import union_snapshots  # noqa: E402

N, R, D = 40, 5, 16
T = 3  # history window


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _copy_params(params, model):
    """Copy OUR pytree params into the reference torch module."""
    with torch.no_grad():
        model.emb_rel.copy_(t(params["emb_rel"]))
        model.dynamic_emb.copy_(t(params["dynamic_emb"]))
        model.weight_t2.copy_(t(params["weight_t2"]))
        model.bias_t2.copy_(t(params["bias_t2"]))
        for ln, (w, b) in {
            "r_linear": ("r_linear_w", "r_linear_b"),
            "time_linear": ("time_linear_w", "time_linear_b"),
            "linear_g": ("linear_g_w", "linear_g_b"),
            "linear_pred_layer_s1": ("linear_s1_w", "linear_s1_b"),
            "linear_pred_layer_o1": ("linear_o1_w", "linear_o1_b"),
        }.items():
            lin = getattr(model, ln)
            lin.weight.copy_(t(params[w]))
            lin.bias.copy_(t(params[b]))
        for cn in ("relation_cell_1", "entity_cell_1",
                   "relation_cell_2", "entity_cell_2"):
            cell, p = getattr(model, cn), params[cn]
            cell.weight_ih.copy_(t(p["w_ih"]))
            cell.weight_hh.copy_(t(p["w_hh"]))
            cell.bias_ih.copy_(t(p["b_ih"]))
            cell.bias_hh.copy_(t(p["b_hh"]))
        for cell_name in ("rgcn", "rgcn_2"):
            for i, layer in enumerate(getattr(model, cell_name).layers):
                lp = params[cell_name]["layers"][i]
                layer.weight_neighbor.copy_(t(lp["w_neighbor"]))
                layer.r_linear.weight.copy_(t(lp["r_linear_w"]))
                layer.r_linear.bias.copy_(t(lp["r_linear_b"]))
                layer.loop_weight.copy_(t(lp["loop_w"]))
                layer.evolve_loop_weight.copy_(t(lp["evolve_loop_w"]))
        for ref_name, our_name in (("cand_layer_raw", "cand_raw"),
                                   ("cand_layer_inv", "cand_inv")):
            for i, layer in enumerate(getattr(model, ref_name).layers):
                lp = params[our_name]["layers"][i]
                layer.attn_fc.weight.copy_(t(lp["attn_fc_w"]))
                layer.pos_proj.weight.copy_(t(lp["pos_proj_w"]))
                layer.weight_neighbor.copy_(t(lp["w_neighbor"]))
                layer.loop_weight.copy_(t(lp["loop_w"]))
                layer.evolve_loop_weight.copy_(t(lp["evolve_loop_w"]))
                layer.conv.weight.copy_(t(lp["conv_w"]).reshape(1, 1, 1))
                layer.conv.bias.copy_(t(lp["conv_b"]))
                layer.bn0.weight.copy_(t(lp["bn0"]["scale"]))
                layer.bn0.bias.copy_(t(lp["bn0"]["bias"]))
        for ref_name, our_name in (("decoder_ob_raw", "decoder_ob_raw"),
                                   ("decoder_ob_inv", "decoder_ob_inv"),
                                   ("rdecoder_re1", "decoder_rel_raw"),
                                   ("rdecoder_re2", "decoder_rel_his")):
            dec, dp = getattr(model, ref_name), params[our_name]
            dec.conv1.weight.copy_(t(dp["conv_w"]))
            dec.conv1.bias.copy_(t(dp["conv_b"]))
            dec.fc.weight.copy_(t(dp["fc_w"]))
            dec.fc.bias.copy_(t(dp["fc_b"]))
            for bn_name in ("bn0", "bn1", "bn2"):
                bn = getattr(dec, bn_name)
                bn.weight.copy_(t(dp[bn_name]["scale"]))
                bn.bias.copy_(t(dp[bn_name]["bias"]))


def _his_snapshot(triples, rows, cols, inv, edge_pad=512):
    """Our query-conditioned history-graph Snapshot from (row, cand)
    pairs — the same edges ref:hisres_rgcn/utils.py:521-585 builds from
    the one-hot vocab (s->o type r; o->s type r±R)."""
    s = triples[rows, 0]
    r = triples[rows, 1]
    o = cols
    src = np.concatenate([s, o]).astype(np.int32)
    dst = np.concatenate([o, s]).astype(np.int32)
    rel = np.concatenate([r, r - R if inv else r + R]).astype(np.int32)
    e = len(src)
    in_deg = np.bincount(dst, minlength=N).astype(np.float32)

    def p(a):
        out = np.zeros((edge_pad,), a.dtype)
        out[: len(a)] = a
        return out

    emask = np.zeros((edge_pad,), np.float32)
    emask[:e] = 1.0
    return Snapshot(
        src=p(src), dst=p(dst), rel=p(rel), edge_mask=emask,
        in_deg_norm=1.0 / np.maximum(in_deg, 1.0),
        has_in_edge=(in_deg > 0).astype(np.float32),
        rc_rel=np.zeros(1, np.int32), rc_ent=np.zeros(1, np.int32),
        rc_mask=np.zeros(1, np.float32), num_edges=e,
        num_triples=len(triples))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    snaps = []
    for _ in range(T):
        m = int(rng.integers(25, 40))
        tri = np.stack([rng.integers(0, N, m), rng.integers(0, R, m),
                        rng.integers(0, N, m)], axis=1)
        snaps.append(np.unique(tri, axis=0).astype(np.int64))
    B = 20
    target = np.stack([rng.integers(0, N, B), rng.integers(0, R, B),
                       rng.integers(0, N, B),
                       np.full(B, T, dtype=np.int64)], axis=1)
    # random one-hot history vocabularies, shared verbatim by both stacks
    voc_ent = (rng.random((2 * B, N)) < 0.08).astype(np.float32)
    voc_rel = (rng.random((2 * B, 2 * R)) < 0.2).astype(np.float32)

    cfg = our_model.HisResConfig(
        num_ents=N, num_rels=R, h_dim=D, n_layers=2, dropout=0.0,
        input_dropout=0.0, hidden_dropout=0.0, feat_dropout=0.0,
        cand_dropout=0.0, history_rate=0.3)
    params, state = our_model.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_get(params)

    ref = RefHisRes(
        "timeconvtranse", "convgcn", N, R, 0, 0, 10, 1, D, "sub", 0.3,
        sequence_len=T, num_bases=100, num_basis=0, num_hidden_layers=2,
        dropout=0.0, self_loop=True, skip_connect=False, layer_norm=True,
        input_dropout=0.0, hidden_dropout=0.0, feat_dropout=0.0,
        aggregation="cat", weight=0.5, discount=1.0, angle=10,
        use_static=False, entity_prediction=True, relation_prediction=True,
        use_cuda=False, gpu=-1)
    _copy_params(params, ref)

    # both stacks' graph streams from the same snapshots
    g_list = [build_sub_graph(N, R, s, False, -1) for s in snaps]
    union_np = [np.concatenate([snaps[i], snaps[i + 1]])
                for i in range(T - 1)]
    gg_list = [build_sub_graph(N, R, s, False, -1) for s in union_np]
    # rc_mode="src": the HisRES r2e adds only source entities
    # (ref:hisres_rgcn/utils.py:77-80) — with the baseline both-endpoints
    # incidence this golden FAILS at ~1e-2 on stream step 0, which was
    # the round-3 refrun's unexplained entity residual
    history = build_history(snaps, N, R, edge_bucket=64, rc_bucket=64,
                            rc_mode="src")
    history_gg = build_history(union_snapshots(snaps), N, R,
                               edge_bucket=64, rc_bucket=64, rc_mode="src")
    assert len(union_snapshots(snaps)) == len(gg_list)

    # our his-graph snapshots from the SAME vocab rows the reference uses
    tri3 = target[:, :3].astype(np.int32)
    inv3 = tri3[:, [2, 1, 0]].copy()
    inv3[:, 1] += R
    raw_rows, raw_cols = np.nonzero(voc_ent[:B])
    inv_rows, inv_cols = np.nonzero(voc_ent[B:])
    hg_raw = _his_snapshot(tri3, raw_rows, raw_cols.astype(np.int32), False)
    hg_inv = _his_snapshot(inv3, inv_rows, inv_cols.astype(np.int32), True)

    return dict(cfg=cfg, params=params, state=state, snaps=snaps,
                g_list=g_list, gg_list=gg_list, history=history,
                history_gg=history_gg, target=target, tri3=tri3, inv3=inv3,
                voc_ent=voc_ent, voc_rel=voc_rel, hg_raw=hg_raw,
                hg_inv=hg_inv, ref=ref, B=B)


def test_predict_golden(setup):
    """Eval-mode end-to-end score parity (covers the LogCL time-encode
    arithmetic, both streams, gate fusion, cand attention, decoders)."""
    s = setup
    s["ref"].eval()
    with torch.no_grad():
        _, score_ref, score_rel_ref = s["ref"].predict(
            s["g_list"], s["gg_list"], None, R, None,
            torch.from_numpy(s["target"]).long(),
            torch.from_numpy(s["voc_ent"]), torch.from_numpy(s["voc_rel"]),
            use_cuda=False)

    ours_ent, ours_rel = our_model.predict(
        jax.tree.map(jnp.asarray, s["params"]), s["state"], s["cfg"],
        s["history"], s["history_gg"], jnp.asarray(s["tri3"]),
        jnp.asarray(s["inv3"]), jnp.ones((s["B"],), jnp.float32),
        s["hg_raw"], s["hg_inv"], jnp.asarray(s["voc_rel"]))

    np.testing.assert_allclose(np.asarray(ours_ent),
                               score_ref.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_rel),
                               score_rel_ref.numpy(), rtol=2e-3, atol=2e-4)


def test_train_loss_golden(setup):
    """Train-mode loss parity with dropouts at 0 — exercises every
    BatchNorm's BATCH statistics (the cand-graph bn0 and the four
    decoders' bn0/1/2), the second named candidate cause."""
    s = setup
    s["ref"].train()
    # the reference's CandRGCN cell HARDCODES dropout=0.2 regardless of
    # the model's dropout arg (ref:hisres_src/hisres.py:70-71), which
    # makes its train-mode entity loss stochastic (~1% spread); zero it
    # so the golden is deterministic — our side runs cand_dropout=0
    for cand in (s["ref"].cand_layer_raw, s["ref"].cand_layer_inv):
        for layer in cand.layers:
            if layer.dropout is not None:
                layer.dropout.p = 0.0
    loss_e_ref, loss_r_ref, _, _ = s["ref"].get_loss(
        s["g_list"], s["gg_list"], None,
        torch.from_numpy(s["target"]).long(), None,
        torch.from_numpy(s["voc_ent"]), torch.from_numpy(s["voc_rel"]),
        use_cuda=False)

    _, losses, _ = our_model.get_loss(
        jax.tree.map(jnp.asarray, s["params"]), s["state"], s["cfg"],
        s["history"], s["history_gg"], jnp.asarray(s["tri3"]),
        jnp.asarray(s["inv3"]), jnp.ones((s["B"],), jnp.float32),
        s["hg_raw"], s["hg_inv"], jnp.asarray(s["voc_rel"]),
        rng=None, train=True)

    np.testing.assert_allclose(float(losses["entity"]),
                               float(loss_e_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(losses["relation"]),
                               float(loss_r_ref), rtol=2e-4, atol=2e-4)


def test_his_graph_matches_reference_builder(setup):
    """Our history-graph edge set == ref:hisres_rgcn/utils.py:490-604
    build_his_graph on the same vocab (raw and inverse)."""
    s = setup
    for inv, tri, voc, snap in (
        (False, s["tri3"], s["voc_ent"][: s["B"]], s["hg_raw"]),
        (True, s["inv3"], s["voc_ent"][s["B"]:], s["hg_inv"]),
    ):
        g = build_his_graph(N, R, torch.from_numpy(
            np.concatenate([tri, np.zeros((len(tri), 1), tri.dtype)], 1)
        ).long(), torch.from_numpy(voc), -1, inv)
        src_r, dst_r = g.edges()
        rel_r = g.edata["type"]
        ref_edges = sorted(zip(src_r.tolist(), rel_r.tolist(),
                               dst_r.tolist()))
        e = snap.num_edges
        our_edges = sorted(zip(snap.src[:e].tolist(), snap.rel[:e].tolist(),
                               snap.dst[:e].tolist()))
        assert our_edges == ref_edges
