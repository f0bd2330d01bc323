"""Golden parity for the ENCODER LAYERS against the reference's own
DGL-dependent layer classes, imported through the tools/refrun DGL shim.

Round-2 verdict item #4: ops/decoders/EST were covered by direct-import
goldens (test_reference_golden.py) but the encoder layers were compared
only against builder-authored torch specs — a shared misreading could
pass silently. Here the reference's own classes run on the shim's
degree-bucketed udf mailboxes (DGL 0.5 semantics), with shared weights:

- ref:rgcn/layers.py:182-279        UnionRGCNLayer       (baseline)
- ref:hyperbolic_layers.py:164-323  HyperbolicUnionRGCNLayer
- ref:hyperbolic_layers.py:331-521  FHNNLayer (Einstein midpoint reduce)
- ref:hyperbolic_layers.py:524-743  LorentzRGCNLayer (Lorentz centroid)
- ref:hyperbolic_layers.py:746-975  HGATLayer (per-head attention)
- ref:hisres_rgcn/layers.py:285-394 UnionRGCNLayer (hisres, +r_linear)
- ref:hisres_rgcn/layers.py:7-114   CandRGCNLayer (attention RGCN)

Every layer family additionally carries a GRADIENT golden (torch
autograd through the reference's degree-bucketed reduces vs jax.grad
through our segment ops, shared weights + probe) — closing the round-3
"forward-only" gap for every aggregation family: sum (baseline +
hisres union), Einstein midpoint (FHNN), Lorentz centroid (LGCN),
segment softmax (HGAT heads, CandRGCN attention).

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
import torch.nn.functional as F

REF = "/root/reference"
SHIMS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "refrun", "shims")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "hyperbolic_src")),
    reason="reference tree not mounted")
for p in (REF, SHIMS):
    if p not in sys.path:
        sys.path.insert(0, p)

# neutralise the reference's hard-coded .cuda() (ref:rgcn/layers.py:229,
# hisres_rgcn/layers.py:58) — same shim as tools/refrun/run_reference.py
torch.Tensor.cuda = lambda self, *a, **kw: self
torch.nn.Module.cuda = lambda self, *a, **kw: self

import dgl  # noqa: E402  (the refrun shim)
from hyperbolic_src import hyperbolic_layers as ref_hyp  # noqa: E402
from rgcn import layers as ref_rgcn  # noqa: E402

import hisres_rgcn.layers as ref_hisres  # noqa: E402
from regcn_tpu.data.snapshots import build_snapshot  # noqa: E402
from regcn_tpu.hisres import layers as our_hisres  # noqa: E402
from regcn_tpu.hyperbolic import layers as HL  # noqa: E402
from regcn_tpu.hyperbolic import ops as H  # noqa: E402
from regcn_tpu.models import layers as our_layers  # noqa: E402

C = 0.01
N, R, D = 40, 5, 16  # small graph: every degree bucket 1..k exercised


@pytest.fixture(scope="module")
def graph_np():
    rng = np.random.default_rng(11)
    m = 70
    triples = np.unique(np.stack([
        rng.integers(0, N, m), rng.integers(0, R, m), rng.integers(0, N, m),
    ], axis=1), axis=0)
    snap = build_snapshot(triples, N, R, edge_bucket=16)
    real = snap.edge_mask > 0
    src, dst, rel = snap.src[real], snap.dst[real], snap.rel[real]
    return snap, src, dst, rel


def make_ref_graph(src, dst, rel, norm, h=None):
    g = dgl.graph((src.astype(np.int64), dst.astype(np.int64)), num_nodes=N)
    g.edata["type"] = torch.from_numpy(rel.astype(np.int64))
    g.ndata["norm"] = torch.from_numpy(norm.astype(np.float32))[:, None]
    if h is not None:
        g.ndata["h"] = torch.from_numpy(h)
    return g


def t(x):
    return torch.from_numpy(np.asarray(x))


def assign(param, value):
    with torch.no_grad():
        param.copy_(t(value))


def assert_close(ours, theirs, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


def ball_points(rng, n=N, d=D, scale=0.4):
    v = rng.normal(size=(n, d)).astype(np.float32) * scale
    return np.asarray(H.exp_map_zero(jnp.asarray(v), C))


# ------------------------------------------------------------ baseline union
class TestUnionRGCNLayer:
    """vs ref:rgcn/layers.py:182-279 (sum reduce, dual self-loop, skip)."""

    @pytest.mark.parametrize("skip", [False, True])
    def test_forward(self, graph_np, rng, skip):
        snap, src, dst, rel = graph_np
        layer = ref_rgcn.UnionRGCNLayer(
            D, D, 2 * R, activation=F.rrelu, self_loop=True,
            skip_connect=skip)
        layer.eval()

        h = rng.normal(size=(N, D)).astype(np.float32)
        prev = rng.normal(size=(N, D)).astype(np.float32)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32)

        params = {
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }
        if skip:
            params["skip_w"] = jnp.asarray(np.asarray(layer.skip_connect_weight.detach()))
            params["skip_b"] = jnp.asarray(np.asarray(layer.skip_connect_bias.detach()))

        g = make_ref_graph(src, dst, rel, snap.in_deg_norm, h=h)
        theirs = layer(g, t(prev) if skip else [], t(rel_emb))

        ours = our_layers.union_rgcn_layer(
            params, jnp.asarray(h), jnp.asarray(rel_emb), snap,
            prev_h=jnp.asarray(prev) if skip else None)
        assert_close(ours, theirs)

    def test_backward(self, graph_np, rng):
        """Gradient golden for the baseline sum-reduce union layer
        (ref:rgcn/layers.py:182-279): d/d(h) flows through g.ndata['h'],
        d/d(rel_emb) through the edge message sub+comp."""
        snap, src, dst, rel = graph_np
        layer = ref_rgcn.UnionRGCNLayer(
            D, D, 2 * R, activation=F.rrelu, self_loop=True,
            skip_connect=False)
        layer.eval()
        h = rng.normal(size=(N, D)).astype(np.float32)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32)
        params = {
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }

        def torch_fwd(h_t, rel_t):
            g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
            g.ndata["h"] = h_t
            return layer(g, [], rel_t)

        _backward_golden(
            layer=torch_fwd,
            our_fn=lambda p, hh, rr: our_layers.union_rgcn_layer(
                p, hh, rr, snap),
            params=params,
            weight_checks=[("w_neighbor", layer.weight_neighbor),
                           ("loop_w", layer.loop_weight)],
            h=h, rel_emb=rel_emb, rng=rng)


# --------------------------------------------------------- hyperbolic union
class TestHyperbolicUnionLayer:
    """vs ref:hyperbolic_layers.py:164-323 (radius-weighted messages)."""

    @pytest.mark.parametrize("skip", [False, True])
    def test_forward(self, graph_np, rng, skip):
        snap, src, dst, rel = graph_np
        layer = ref_hyp.HyperbolicUnionRGCNLayer(
            D, D, 2 * R, c=C, activation=F.rrelu, self_loop=True,
            skip_connect=skip, radius_msg_gamma=0.8)
        layer.eval()

        h = ball_points(rng)
        prev = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3

        params = {
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }
        if skip:
            params["skip_w"] = jnp.asarray(np.asarray(layer.skip_weight.detach()))
            params["skip_b"] = jnp.asarray(np.asarray(layer.skip_bias.detach()))

        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        theirs = layer(g, t(h), t(rel_emb),
                       prev_h=t(prev) if skip else None)

        ours = HL.hyperbolic_union_layer(
            params, jnp.asarray(h), jnp.asarray(rel_emb), snap, C,
            prev_h=jnp.asarray(prev) if skip else None, radius_gamma=0.8)
        assert_close(ours, theirs, rtol=2e-4, atol=2e-5)

    def test_backward(self, graph_np, rng):
        """GRADIENT golden (round-3 verdict weak item #5: layer goldens
        were forward-only): torch autograd vs jax.grad of the same
        weighted-sum scalar through ref:hyperbolic_layers.py:164-323 on
        shared weights — checks d/d(h), d/d(rel_emb) and
        d/d(weight_neighbor) through the radius-weighted message, the
        clamps and the exp/log maps."""
        snap, src, dst, rel = graph_np
        layer = ref_hyp.HyperbolicUnionRGCNLayer(
            D, D, 2 * R, c=C, activation=F.rrelu, self_loop=True,
            skip_connect=False, radius_msg_gamma=0.8)
        layer.eval()

        h = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3
        probe = rng.normal(size=(N, D)).astype(np.float32)

        params = {
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }

        h_t = t(h).requires_grad_(True)
        rel_t = t(rel_emb).requires_grad_(True)
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        out_t = layer(g, h_t, rel_t)
        (out_t * t(probe)).sum().backward()
        grad_w_t = layer.weight_neighbor.grad

        def loss_fn(p, hh, rr):
            out = HL.hyperbolic_union_layer(p, hh, rr, snap, C,
                                            radius_gamma=0.8)
            return jnp.sum(out * jnp.asarray(probe))

        grads = jax.grad(loss_fn, argnums=(0, 1, 2))(
            params, jnp.asarray(h), jnp.asarray(rel_emb))
        np.testing.assert_allclose(np.asarray(grads[1]), h_t.grad.numpy(),
                                   rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(grads[2]), rel_t.grad.numpy(),
                                   rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(grads[0]["w_neighbor"]),
                                   grad_w_t.numpy(), rtol=5e-3, atol=5e-4)


def _backward_golden(layer, our_fn, params, weight_checks,
                     h, rel_emb, rng, rtol=5e-3, atol=5e-4):
    """Shared gradient-golden driver: torch autograd through the
    reference layer's degree-bucketed udf reduce vs jax.grad through our
    segment-op layer, on shared weights, same probe-weighted scalar.
    weight_checks: list of (our_param_key, torch_param) to compare."""
    probe = rng.normal(size=h.shape).astype(np.float32)
    h_t = t(h).requires_grad_(True)
    rel_t = t(rel_emb).requires_grad_(True)
    out_t = layer(h_t, rel_t)
    (out_t * t(probe)).sum().backward()

    def loss_fn(p, hh, rr):
        return jnp.sum(our_fn(p, hh, rr) * jnp.asarray(probe))

    grads = jax.grad(loss_fn, argnums=(0, 1, 2))(
        params, jnp.asarray(h), jnp.asarray(rel_emb))
    np.testing.assert_allclose(np.asarray(grads[1]), h_t.grad.numpy(),
                               rtol=rtol, atol=atol)
    # HGAT takes rel_emb "for compatibility, not used" (ref:883) -> its
    # torch grad is None; ours must then be identically zero
    rel_grad_t = (rel_t.grad.numpy() if rel_t.grad is not None
                  else np.zeros_like(rel_emb))
    np.testing.assert_allclose(np.asarray(grads[2]), rel_grad_t,
                               rtol=rtol, atol=atol)
    for key, torch_param in weight_checks:
        np.testing.assert_allclose(np.asarray(grads[0][key]),
                                   torch_param.grad.numpy(),
                                   rtol=rtol, atol=atol)


# ------------------------------------------------------------------- FHNN
class TestFHNNLayer:
    """vs ref:hyperbolic_layers.py:331-521: per-relation Möbius matvec
    messages reduced by the per-node Einstein-midpoint loop (the shim runs
    the reference's ACTUAL degree-bucketed python reduce)."""

    def test_forward(self, graph_np, rng):
        snap, src, dst, rel = graph_np
        layer = ref_hyp.FHNNLayer(D, D, 2 * R, c=C, activation=F.rrelu,
                                  self_loop=True)
        layer.eval()

        h = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3
        params = {
            "rel_weight": jnp.asarray(np.asarray(layer.rel_weight.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
        }
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        theirs = layer(g, t(h), t(rel_emb))
        # zero-degree nodes: the udf reduce never visits them (mailbox
        # empty) -> their h_agg row stays 0; ours mirrors that
        ours = HL.fhnn_layer(params, jnp.asarray(h), jnp.asarray(rel_emb),
                             snap, C)
        assert_close(ours, theirs, rtol=3e-4, atol=3e-5)

    def test_backward(self, graph_np, rng):
        """Gradient golden through the Einstein-midpoint reduce
        (ref:hyperbolic_layers.py:371-395): torch autograd through the
        reference's per-node python loop vs jax.grad through our
        (Σγw·x, Σγw) segment partials."""
        snap, src, dst, rel = graph_np
        layer = ref_hyp.FHNNLayer(D, D, 2 * R, c=C, activation=F.rrelu,
                                  self_loop=True)
        layer.eval()
        h = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3
        params = {
            "rel_weight": jnp.asarray(np.asarray(layer.rel_weight.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
        }
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        _backward_golden(
            layer=lambda hh, rr: layer(g, hh, rr),
            our_fn=lambda p, hh, rr: HL.fhnn_layer(p, hh, rr, snap, C),
            params=params, weight_checks=[("rel_weight", layer.rel_weight)],
            h=h, rel_emb=rel_emb, rng=rng)


# ------------------------------------------------------------------- LGCN
class TestLorentzLayer:
    """vs ref:hyperbolic_layers.py:524-743: block-decomposed transform +
    per-node Lorentz-centroid reduce loop."""

    @pytest.mark.parametrize("n_bases", [2, 4])
    def test_forward(self, graph_np, rng, n_bases):
        snap, src, dst, rel = graph_np
        layer = ref_hyp.LorentzRGCNLayer(
            D, D, 2 * R, num_bases=n_bases, c=C, activation=F.rrelu,
            self_loop=True)
        layer.eval()

        h = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3
        params = {
            "weight": jnp.asarray(np.asarray(layer.weight.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        theirs = layer(g, t(h), t(rel_emb))
        ours = HL.lgcn_layer(params, jnp.asarray(h), jnp.asarray(rel_emb),
                             snap, C, n_bases)
        assert_close(ours, theirs, rtol=3e-4, atol=3e-5)

    def test_backward(self, graph_np, rng):
        """Gradient golden through the Lorentz-centroid reduce
        (ref:hyperbolic_ops.py:563-581): torch autograd through the
        reference's per-node loop vs jax.grad through our vectorized
        centroid segments (incl. the Minkowski-norm renormalisation)."""
        snap, src, dst, rel = graph_np
        n_bases = 4
        layer = ref_hyp.LorentzRGCNLayer(
            D, D, 2 * R, num_bases=n_bases, c=C, activation=F.rrelu,
            self_loop=True)
        layer.eval()
        h = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3
        params = {
            "weight": jnp.asarray(np.asarray(layer.weight.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        _backward_golden(
            layer=lambda hh, rr: layer(g, hh, rr),
            our_fn=lambda p, hh, rr: HL.lgcn_layer(p, hh, rr, snap, C,
                                                   n_bases),
            params=params, weight_checks=[("weight", layer.weight)],
            h=h, rel_emb=rel_emb, rng=rng)


# ------------------------------------------------------------------- HGAT
class TestHGATLayer:
    """vs ref:hyperbolic_layers.py:746-975: per-relation per-head
    transforms, mobius_add(-h_dst) attention logits, per-node softmax +
    Einstein midpoint per head, tangent head averaging."""

    def test_forward(self, graph_np, rng):
        snap, src, dst, rel = graph_np
        heads = 2
        layer = ref_hyp.HGATLayer(D, D, 2 * R, num_heads=heads, c=C,
                                  activation=F.rrelu, self_loop=True)
        layer.eval()

        h = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3
        params = {
            "rel_weight": jnp.asarray(np.asarray(layer.rel_weight.detach())),
            "attn_vec": jnp.asarray(np.asarray(layer.attn_vec.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
        }
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        theirs = layer(g, t(h), t(rel_emb))
        ours = HL.hgat_layer(params, jnp.asarray(h), jnp.asarray(rel_emb),
                             snap, C, num_heads=heads)
        assert_close(ours, theirs, rtol=3e-4, atol=3e-5)

    def test_backward(self, graph_np, rng):
        """Gradient golden through the per-node segment softmax +
        per-head Einstein midpoint (ref:hyperbolic_layers.py:847-873):
        torch autograd vs jax.grad, incl. d/d(attn_vec) through the
        mobius_add(-h_dst) attention logits."""
        snap, src, dst, rel = graph_np
        heads = 2
        layer = ref_hyp.HGATLayer(D, D, 2 * R, num_heads=heads, c=C,
                                  activation=F.rrelu, self_loop=True)
        layer.eval()
        h = ball_points(rng)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3
        params = {
            "rel_weight": jnp.asarray(np.asarray(layer.rel_weight.detach())),
            "attn_vec": jnp.asarray(np.asarray(layer.attn_vec.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
        }
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
        _backward_golden(
            layer=lambda hh, rr: layer(g, hh, rr),
            our_fn=lambda p, hh, rr: HL.hgat_layer(p, hh, rr, snap, C,
                                                   num_heads=heads),
            params=params,
            weight_checks=[("rel_weight", layer.rel_weight),
                           ("attn_vec", layer.attn_vec)],
            h=h, rel_emb=rel_emb, rng=rng)


# ---------------------------------------------------------- hisres layers
class TestHisResUnionLayer:
    """vs ref:hisres_rgcn/layers.py:285-394 (union + r_linear branch)."""

    def test_forward(self, graph_np, rng):
        snap, src, dst, rel = graph_np
        layer = ref_hisres.UnionRGCNLayer(
            D, D, 2 * R, activation=F.rrelu, self_loop=True)
        layer.eval()

        h = rng.normal(size=(N, D)).astype(np.float32)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32)
        params = {
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "r_linear_w": jnp.asarray(np.asarray(layer.r_linear.weight.detach())),
            "r_linear_b": jnp.asarray(np.asarray(layer.r_linear.bias.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }
        g = make_ref_graph(src, dst, rel, snap.in_deg_norm, h=h)
        node_t, edge_t = layer(g, [], t(rel_emb))
        node_o, edge_o = our_hisres.hisres_union_layer(
            params, jnp.asarray(h), jnp.asarray(rel_emb), snap)
        assert_close(node_o, node_t)
        assert_close(edge_o, edge_t)

    def test_backward(self, graph_np, rng):
        """Gradient golden for the hisres union layer (node output probe;
        the r_linear edge branch shares every parameter with it)."""
        snap, src, dst, rel = graph_np
        layer = ref_hisres.UnionRGCNLayer(
            D, D, 2 * R, activation=F.rrelu, self_loop=True)
        layer.eval()
        h = rng.normal(size=(N, D)).astype(np.float32)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32)
        params = {
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "r_linear_w": jnp.asarray(np.asarray(layer.r_linear.weight.detach())),
            "r_linear_b": jnp.asarray(np.asarray(layer.r_linear.bias.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
        }

        def torch_fwd(h_t, rel_t):
            g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
            g.ndata["h"] = h_t
            return layer(g, [], rel_t)[0]

        _backward_golden(
            layer=torch_fwd,
            our_fn=lambda p, hh, rr: our_hisres.hisres_union_layer(
                p, hh, rr, snap)[0],
            params=params,
            weight_checks=[("w_neighbor", layer.weight_neighbor)],
            h=h, rel_emb=rel_emb, rng=rng)


class TestCandRGCNLayer:
    """vs ref:hisres_rgcn/layers.py:7-114: attention logits
    attn_fc(leaky_relu(pos_proj([h_s; r; h_d]))), conv1d(bn0(h_s + r)) @ W
    messages, per-node softmax reduce, dual self-loop."""

    def test_forward(self, graph_np, rng):
        snap, src, dst, rel = graph_np
        layer = ref_hisres.CandRGCNLayer(
            D, D, 2 * R, activation=F.rrelu, self_loop=True)
        layer.eval()  # BN running stats (0/1): deterministic golden

        h = rng.normal(size=(N, D)).astype(np.float32)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32)
        params = {
            "attn_fc_w": jnp.asarray(np.asarray(layer.attn_fc.weight.detach())),
            "pos_proj_w": jnp.asarray(np.asarray(layer.pos_proj.weight.detach())),
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
            "conv_w": jnp.asarray(np.asarray(layer.conv.weight.detach()).reshape(1)),
            "conv_b": jnp.asarray(np.asarray(layer.conv.bias.detach()).reshape(1)),
            "bn0": {"scale": jnp.ones((1,)), "bias": jnp.zeros((1,))},
        }
        bn_state = {"mean": jnp.zeros((1,)), "var": jnp.ones((1,)),
                    "count": jnp.zeros(())}

        g = make_ref_graph(src, dst, rel, snap.in_deg_norm, h=h)
        g.edata["r"] = t(rel_emb)[t(rel.astype(np.int64))]
        theirs = layer(g, [], t(rel_emb))

        ours, _ = our_hisres.cand_rgcn_layer(
            params, bn_state, jnp.asarray(h), jnp.asarray(rel_emb), snap)
        assert_close(ours, theirs, rtol=2e-4, atol=2e-5)

    def test_backward(self, graph_np, rng):
        """Gradient golden through the candidate-graph attention reduce
        (softmax(attn_fc(leaky_relu(pos_proj([h_s; r; h_d])))) messages,
        ref:hisres_rgcn/layers.py:7-114), eval-mode BN."""
        snap, src, dst, rel = graph_np
        layer = ref_hisres.CandRGCNLayer(
            D, D, 2 * R, activation=F.rrelu, self_loop=True)
        layer.eval()
        h = rng.normal(size=(N, D)).astype(np.float32)
        rel_emb = rng.normal(size=(2 * R, D)).astype(np.float32)
        params = {
            "attn_fc_w": jnp.asarray(np.asarray(layer.attn_fc.weight.detach())),
            "pos_proj_w": jnp.asarray(np.asarray(layer.pos_proj.weight.detach())),
            "w_neighbor": jnp.asarray(np.asarray(layer.weight_neighbor.detach())),
            "loop_w": jnp.asarray(np.asarray(layer.loop_weight.detach())),
            "evolve_loop_w": jnp.asarray(np.asarray(layer.evolve_loop_weight.detach())),
            "conv_w": jnp.asarray(np.asarray(layer.conv.weight.detach()).reshape(1)),
            "conv_b": jnp.asarray(np.asarray(layer.conv.bias.detach()).reshape(1)),
            "bn0": {"scale": jnp.ones((1,)), "bias": jnp.zeros((1,))},
        }
        bn_state = {"mean": jnp.zeros((1,)), "var": jnp.ones((1,)),
                    "count": jnp.zeros(())}
        rel_idx = t(rel.astype(np.int64))

        def torch_fwd(h_t, rel_t):
            g = make_ref_graph(src, dst, rel, snap.in_deg_norm)
            g.ndata["h"] = h_t
            g.edata["r"] = rel_t[rel_idx]
            return layer(g, [], rel_t)

        _backward_golden(
            layer=torch_fwd,
            our_fn=lambda p, hh, rr: our_hisres.cand_rgcn_layer(
                p, bn_state, hh, rr, snap)[0],
            params=params,
            weight_checks=[("w_neighbor", layer.weight_neighbor),
                           ("attn_fc_w", layer.attn_fc.weight),
                           ("pos_proj_w", layer.pos_proj.weight)],
            h=h, rel_emb=rel_emb, rng=rng)
