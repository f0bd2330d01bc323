"""FULL-MODEL golden: our hyperbolic model vs the reference's own
``HyperbolicRecurrentRGCN`` (ref:hyperbolic_src/hyperbolic_model.py:157-1128).

Round-4 verdict weak item #1: the hyperbolic configs trail the
reference's relation MRR in every truncated-budget refrun (config 3 on
all four test metrics). The layer and decoder families each have
direct-import goldens, but the MODEL-level glue — relation-context
segment means -> relation GRU -> encoder stack -> time gate -> radius
evolution -> final tangent normalise -> decoder inputs — had none, and
that glue is exactly where the hisres campaign found its real bug (the
rc-incidence divergence). This file runs the reference's own model
through the refrun DGL shim with weights copied INTO our pytree and
compares, per config named in BASELINE.json:

- config 3: lgcn encoder + RotH / RotH-Rel decoders
- config 4: uvrgcn encoder + AttH / AttH-Rel with learned + relation-
  specific curvature and entity Euclidean bias

For each: eval-mode entity AND relation score matrices end to end, plus
the four training-loss components (entity / relation / static=0 /
radius) on shared weights with dropouts at 0.

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
    not os.path.isdir(os.path.join(REF, "hyperbolic_src")),
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

from hyperbolic_src.hyperbolic_model import HyperbolicRecurrentRGCN  # noqa: E402
from rgcn.utils import build_sub_graph  # noqa: E402

from regcn_tpu.data.snapshots import build_history  # noqa: E402
from regcn_tpu.hyperbolic import model as M  # noqa: E402

N, R, D = 40, 5, 16
T = 3  # history window
NB = 4  # lgcn block bases (D=16 divisible)
C = 0.01


def a(torch_param):
    return jnp.asarray(np.asarray(torch_param.detach()))


def _copy_encoder_layers(ref_cell, encoder):
    layers = []
    for layer in ref_cell.layers:
        if encoder == "hyperbolic_uvrgcn":
            lp = {"w_neighbor": a(layer.weight_neighbor)}
        elif encoder == "lgcn":
            lp = {"weight": a(layer.weight)}
        else:
            raise ValueError(encoder)
        lp["loop_w"] = a(layer.loop_weight)
        lp["evolve_loop_w"] = a(layer.evolve_loop_weight)
        if getattr(layer, "skip_connect", False):
            lp["skip_w"] = a(layer.skip_weight)
            lp["skip_b"] = a(layer.skip_bias)
        layers.append(lp)
    return {"layers": layers}


def _copy_convtrans(dec):
    """ConvTransE/R weights (ref:hyperbolic_decoder.py:310-510); BN
    running stats stay at their identical fresh-init values on both
    sides (eval mode uses them)."""
    return {
        "conv_w": a(dec.conv1.weight), "conv_b": a(dec.conv1.bias),
        "fc_w": a(dec.fc.weight), "fc_b": a(dec.fc.bias),
        "b": a(dec.b),
        "bn0": {"scale": a(dec.bn0.weight), "bias": a(dec.bn0.bias)},
        "bn1": {"scale": a(dec.bn1.weight), "bias": a(dec.bn1.bias)},
        "bn2": {"scale": a(dec.bn2.weight), "bias": a(dec.bn2.bias)},
    }


def _copy_decoder_ob(dec, decoder):
    if decoder == "hyperbolic_convtranse":
        return _copy_convtrans(dec)
    if decoder == "roth":
        p = {
            "rot_w": a(dec.rot_proj.weight), "rot_b": a(dec.rot_proj.bias),
            "trans_w": a(dec.trans_proj.weight), "trans_b": a(dec.trans_proj.bias),
            "reshape_w1": a(dec.reshape_fc1.weight), "reshape_b1": a(dec.reshape_fc1.bias),
            "reshape_w2": a(dec.reshape_fc2.weight), "reshape_b2": a(dec.reshape_fc2.bias),
        }
    elif decoder == "atth":
        p = {
            "rot_w": a(dec.rot_proj.weight), "rot_b": a(dec.rot_proj.bias),
            "ref_w": a(dec.ref_proj.weight), "ref_b": a(dec.ref_proj.bias),
            "trans_w": a(dec.trans_proj.weight), "trans_b": a(dec.trans_proj.bias),
            "attn_w": a(dec.attn_proj.weight), "attn_b": a(dec.attn_proj.bias),
        }
    else:
        raise ValueError(decoder)
    p["score_scale_raw"] = a(dec.score_scale_raw)
    p["score_margin"] = a(dec.score_margin)
    if getattr(dec, "entity_bias", None) is not None:
        p["entity_bias"] = a(dec.entity_bias)
    if getattr(dec, "rel_curvature_raw", None) is not None:
        p["rel_curvature_raw"] = a(dec.rel_curvature_raw)
    return p


def _copy_decoder_rel(dec, decoder):
    if decoder == "hyperbolic_convtranse":
        return _copy_convtrans(dec)
    if decoder == "roth":
        p = {
            "global_rot": a(dec.global_rot),
            "reshape_w1": a(dec.reshape_fc1.weight), "reshape_b1": a(dec.reshape_fc1.bias),
            "reshape_w2": a(dec.reshape_fc2.weight), "reshape_b2": a(dec.reshape_fc2.bias),
        }
    elif decoder == "atth":
        p = {
            "global_rot": a(dec.global_rot),
            "global_ref": a(dec.global_ref),
            "attn_weight": a(dec.attn_weight),
        }
    else:
        raise ValueError(decoder)
    p["rel_bias"] = a(dec.rel_bias)
    p["score_scale_raw"] = a(dec.score_scale_raw)
    p["score_margin"] = a(dec.score_margin)
    return p


def _params_from_ref(ref, cfg):
    """Build OUR param pytree from the reference module's weights."""
    params = {
        "dynamic_emb": a(ref.dynamic_emb),
        "emb_rel": a(ref.emb_rel),
        "time_gate_w": a(ref.time_gate_weight),
        "time_gate_b": a(ref.time_gate_bias),
        "gru": {
            "w_ih": a(ref.relation_gru.weight_ih),
            "w_hh": a(ref.relation_gru.weight_hh),
            "b_ih": a(ref.relation_gru.bias_ih),
            "b_hh": a(ref.relation_gru.bias_hh),
        },
        "radius_mlp_w": a(ref.temporal_radius_evolution.radius_mlp.weight),
        "radius_mlp_b": a(ref.temporal_radius_evolution.radius_mlp.bias),
        "radius_static": a(ref.radius_static),
        "rgcn": _copy_encoder_layers(ref.rgcn, cfg.encoder),
        "decoder_ob": _copy_decoder_ob(ref.decoder_ob, cfg.decoder),
        "decoder_rel": _copy_decoder_rel(ref.rdecoder, cfg.decoder),
    }
    if cfg.learn_curvature:
        params["log_c"] = a(ref.log_c)
    return params


CONFIGS = {
    # config 1 / the flagship: uvrgcn + hyperbolic ConvTransE/R — the
    # decoder family configs 1 and 5 run (the SMALL refrun pinned it
    # end-to-end; this pins the model glue layer by layer)
    "c1_flagship": dict(
        encoder="hyperbolic_uvrgcn", decoder="hyperbolic_convtranse",
        learn_curvature=False, use_entity_bias=False, use_rel_curvature=False),
    # config 3 of BASELINE.json: Lorentz GCN encoder + RotH decoders
    "c3_lgcn_roth": dict(
        encoder="lgcn", decoder="roth",
        learn_curvature=False, use_entity_bias=False, use_rel_curvature=False),
    # config 4: AttH with learned + relation-specific curvature + entity bias
    "c4_atth_extras": dict(
        encoder="hyperbolic_uvrgcn", decoder="atth",
        learn_curvature=True, use_entity_bias=True, use_rel_curvature=True),
}


@pytest.fixture(scope="module", params=sorted(CONFIGS))
def setup(request):
    name = request.param
    c = CONFIGS[name]
    rng = np.random.default_rng(13)
    snaps = []
    for _ in range(T):
        m = int(rng.integers(25, 40))
        tri = np.stack([rng.integers(0, N, m), rng.integers(0, R, m),
                        rng.integers(0, N, m)], axis=1)
        snaps.append(np.unique(tri, axis=0).astype(np.int64))
    B = 20
    triples = np.stack([rng.integers(0, N, B), rng.integers(0, R, B),
                        rng.integers(0, N, B)], axis=1).astype(np.int64)
    inv = triples[:, [2, 1, 0]].copy()
    inv[:, 1] += R
    all_triples = np.concatenate([triples, inv])

    cfg = M.HyperbolicConfig(
        num_ents=N, num_rels=R, h_dim=D, n_layers=2,
        encoder=c["encoder"], decoder=c["decoder"],
        dropout=0.0, input_dropout=0.0, hidden_dropout=0.0, feat_dropout=0.0,
        self_loop=True, layer_norm=True, c=C, n_bases=NB,
        learn_curvature=c["learn_curvature"],
        use_entity_bias=c["use_entity_bias"],
        use_rel_curvature=c["use_rel_curvature"],
        radius_msg_gamma=0.15,
    )

    torch.manual_seed(3)
    ref = HyperbolicRecurrentRGCN(
        c["decoder"], c["encoder"], N, R, 0, 0, D, "sub", sequence_len=T,
        num_bases=NB, num_hidden_layers=2, dropout=0.0, c=C,
        self_loop=True, skip_connect=False, layer_norm=True,
        input_dropout=0.0, hidden_dropout=0.0, feat_dropout=0.0,
        use_static=False, entity_prediction=True, relation_prediction=True,
        use_cuda=False, gpu=-1,
        learn_curvature=c["learn_curvature"],
        use_entity_euclidean_bias=c["use_entity_bias"],
        use_relation_specific_curvature=c["use_rel_curvature"],
        radius_msg_gamma=0.15,
    )
    ref.eval()

    params, state = M.init_params(jax.random.PRNGKey(0), cfg)
    ref_params = _params_from_ref(ref, cfg)
    # structure check: the copied tree must match our init's structure
    assert (jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, ref_params))
            == jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, params)))
    params = ref_params

    g_list = [build_sub_graph(N, R, s, False, -1) for s in snaps]
    history = build_history(snaps, N, R, edge_bucket=64, rc_bucket=64)

    return dict(name=name, cfg=cfg, params=params, state=state, ref=ref,
                g_list=g_list, history=history,
                triples=triples, all_triples=all_triples)


def test_predict_golden(setup):
    """Eval-mode end-to-end score parity: relation-context means -> GRU
    -> encoder stack -> time gate -> radius evolution -> final normalise
    -> both decoders (ref :892-939)."""
    s = setup
    with torch.no_grad():
        _, score_ref, score_rel_ref = s["ref"].predict(
            s["g_list"], R, None, torch.from_numpy(s["triples"]).long(),
            False)

    mask = jnp.ones((len(s["all_triples"]),), jnp.float32)
    scores_ob, scores_rel = M.predict(
        jax.tree.map(jnp.asarray, s["params"]), s["state"], s["cfg"],
        s["history"], jnp.asarray(s["all_triples"]), mask)

    np.testing.assert_allclose(np.asarray(scores_ob), score_ref.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(scores_rel), score_rel_ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_loss_golden(setup):
    """All four loss components on shared weights (ref :941-1088), eval
    mode + dropouts 0 (RotH/AttH have no BatchNorm, so eval-mode losses
    exercise every deterministic term of the training objective: the
    decoder .loss CE paths, the radius supervision MSE)."""
    s = setup
    ref = s["ref"]
    with torch.no_grad():
        l_ent, l_rel, l_static, l_radius = ref.get_loss(
            s["g_list"], torch.from_numpy(s["triples"]).long(), None, False)

    mask = jnp.ones((len(s["all_triples"]),), jnp.float32)
    _, losses, _, _ = M.get_loss(
        jax.tree.map(jnp.asarray, s["params"]), s["state"], s["cfg"],
        s["history"], jnp.asarray(s["all_triples"]), mask,
        rng=None, train=False)

    np.testing.assert_allclose(float(losses["entity"]), float(l_ent),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(losses["relation"]), float(l_rel),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(losses["radius"]), float(l_radius),
                               rtol=2e-4, atol=2e-6)
    assert float(losses["static"]) == 0.0 and float(l_static) == 0.0
