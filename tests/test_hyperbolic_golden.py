"""Golden parity: hyperbolic UnionRGCN layer vs an independent numpy/torch
spec implementation (behavioral spec from SURVEY.md §2.3 /
ref:hyperbolic_src/hyperbolic_layers.py:164-323)."""

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.data import build_snapshot
from regcn_tpu.hyperbolic import layers as L
from regcn_tpu.hyperbolic import ops as H

C = 0.01


def _np_log0(x, c=C, eps=1e-6):
    n = np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), eps)
    scaled = np.minimum(np.sqrt(c) * n, 1 - eps)
    return np.arctanh(scaled) * x / (np.sqrt(c) * n)


def _np_exp0(v, c=C, eps=1e-6):
    n = np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), eps)
    out = np.tanh(np.sqrt(c) * n) * (v / n) / np.sqrt(c)
    # project
    on = np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), eps)
    max_norm = 1 / np.sqrt(c) - eps
    return out * (np.minimum(on, max_norm - eps) / on)


def test_hyperbolic_union_layer_matches_spec(rng, tiny_graph):
    n, r, triples = tiny_graph
    d = 16
    gamma = 1.3
    snap = build_snapshot(triples, n, r, edge_bucket=64)
    h_hyper = np.asarray(H.exp_map_zero(
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) * 0.3), C))
    rel_emb = rng.normal(size=(2 * r, d)).astype(np.float32) * 0.3
    params = L.init_hyperbolic_union_layer(jax.random.PRNGKey(5), d, self_loop=True)

    out = L.hyperbolic_union_layer(
        params, jnp.asarray(h_hyper), jnp.asarray(rel_emb), snap, C,
        radius_gamma=gamma,
    )

    # ---- independent spec implementation (loops) ----
    w = np.asarray(params["w_neighbor"])
    loop_w = np.asarray(params["loop_w"])
    evolve_w = np.asarray(params["evolve_loop_w"])
    h_tan = _np_log0(h_hyper)
    radius = np.maximum(np.linalg.norm(h_hyper, axis=-1), 1e-6)

    agg = np.zeros((n, d), np.float32)
    in_deg = np.zeros(n)
    edges = [(s, rr, o) for s, rr, o in triples] + \
            [(o, rr + r, s) for s, rr, o in triples]
    for u, _, v in edges:
        in_deg[v] += 1
    for u, rr, v in edges:
        msg = (h_tan[u] + rel_emb[rr]) @ w
        msg = msg * np.exp(-gamma * abs(radius[u] - radius[v]))
        agg[v] += msg
    h_new = agg / np.maximum(in_deg, 1)[:, None]
    h_new = np.clip(h_new, -10, 10)
    has_in = in_deg > 0
    loop = np.where(has_in[:, None], h_tan @ loop_w, h_tan @ evolve_w)
    h_new = np.clip(h_new + loop, -10, 10)
    slope = (1 / 8 + 1 / 3) / 2
    h_new = np.where(h_new >= 0, h_new, h_new * slope)
    expected = _np_exp0(h_new)

    np.testing.assert_allclose(np.asarray(out), expected, rtol=3e-4, atol=3e-4)
