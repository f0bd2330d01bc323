"""HisRES GNN layers.

- :func:`hisres_union_layer` — baseline UnionRGCN plus a relation-update
  branch: returns ``(node_repr, edge_repr)`` where
  ``edge_repr = rrelu(Linear(rel_emb))`` (ref:hisres_rgcn/layers.py:285-394;
  the hard-coded ``.cuda()`` at :349-351 is not reproduced).
- :func:`cand_rgcn_layer` — attention RGCN over the query-conditioned
  history graph: edge logits ``attn_fc(leaky_relu(pos_proj([h_s; r; h_d])))``,
  messages ``conv1d_{1x1}(bn(h_s + r)) @ W``, softmax-weighted reduce,
  dual self-loop (ref:hisres_rgcn/layers.py:7-114). The per-node mailbox
  softmax becomes a masked segment softmax.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regcn_tpu.dist import HaloImpl, require_halo
from regcn_tpu.models.decoders import _batch_norm, _init_bn
from regcn_tpu.ops.activations import rrelu
from regcn_tpu.ops.segment import segment_softmax
from regcn_tpu.utils.init import RELU_GAIN, torch_linear_uniform, xavier_normal, xavier_uniform

Params = Dict[str, jax.Array]


def init_hisres_union_layer(rng, h_dim, self_loop=True, skip_connect=False) -> Params:
    ks = jax.random.split(rng, 6)
    p: Params = {
        "w_neighbor": xavier_uniform(ks[0], (h_dim, h_dim), gain=RELU_GAIN),
        "r_linear_w": torch_linear_uniform(ks[1], (h_dim, h_dim), h_dim),
        "r_linear_b": torch_linear_uniform(ks[2], (h_dim,), h_dim),
    }
    if self_loop:
        p["loop_w"] = xavier_uniform(ks[3], (h_dim, h_dim), gain=RELU_GAIN)
        p["evolve_loop_w"] = xavier_uniform(ks[4], (h_dim, h_dim), gain=RELU_GAIN)
    if skip_connect:
        p["skip_w"] = xavier_uniform(ks[5], (h_dim, h_dim), gain=RELU_GAIN)
        p["skip_b"] = jnp.zeros((h_dim,))
    return p


def hisres_union_layer(
    params: Params,
    h: jax.Array,
    rel_emb: jax.Array,  # [2R, d] current evolved relation embeddings
    snap,
    *,
    prev_h: Optional[jax.Array] = None,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    n = h.shape[0]
    if isinstance(impl, HaloImpl):
        from regcn_tpu.parallel.halo import halo_rgcn_aggregate

        node_repr = halo_rgcn_aggregate(
            impl.mesh, h, rel_emb, params["w_neighbor"], require_halo(snap))
    else:
        msg = (h[snap.src] + rel_emb[snap.rel]) @ params["w_neighbor"]
        msg = msg * snap.edge_mask[:, None]
        agg = jax.ops.segment_sum(msg, snap.dst, num_segments=n)
        node_repr = agg * snap.in_deg_norm[:, None].astype(agg.dtype)

    edge_repr = rel_emb @ params["r_linear_w"].T + params["r_linear_b"]

    if "loop_w" in params:
        loop_in = h @ params["loop_w"]
        loop_iso = h @ params["evolve_loop_w"]
        loop = jnp.where(snap.has_in_edge[:, None] > 0, loop_in, loop_iso)
    if prev_h is not None and "skip_w" in params:
        gate = jax.nn.sigmoid(prev_h @ params["skip_w"] + params["skip_b"])
        if "loop_w" in params:
            node_repr = node_repr + loop
        node_repr = gate * node_repr + (1 - gate) * prev_h
    elif "loop_w" in params:
        node_repr = node_repr + loop

    node_repr = rrelu(node_repr, None, train=False)  # F.rrelu default
    edge_repr = rrelu(edge_repr, None, train=False)
    if train and dropout > 0 and rng is not None:
        k1, k2 = jax.random.split(rng)
        keep_n = jax.random.bernoulli(k1, 1 - dropout, node_repr.shape)
        node_repr = jnp.where(keep_n, node_repr / (1 - dropout), 0.0)
        keep_e = jax.random.bernoulli(k2, 1 - dropout, edge_repr.shape)
        edge_repr = jnp.where(keep_e, edge_repr / (1 - dropout), 0.0)
    return node_repr, edge_repr


def init_hisres_rgcn_cell(rng, h_dim, n_layers, self_loop=True, skip_connect=False) -> Params:
    keys = jax.random.split(rng, n_layers)
    return {
        "layers": [
            init_hisres_union_layer(keys[i], h_dim, self_loop, skip_connect and i > 0)
            for i in range(n_layers)
        ]
    }


def hisres_rgcn_cell(params, h, rel_emb, snap, *, dropout=0.0, rng=None,
                     train=False, impl="xla"):
    """Threads the evolving relation embedding through the layer stack
    (ref:hisres_src/hisres.py:33-41): x, r = layer(g, [], r)."""
    x, r = h, rel_emb
    for i, lp in enumerate(params["layers"]):
        k = jax.random.fold_in(rng, i) if rng is not None else None
        x, r = hisres_union_layer(lp, x, r, snap, dropout=dropout, rng=k,
                                  train=train, impl=impl)
    return x, r


# ------------------------------------------------------------- CandRGCN

def init_cand_layer(rng, h_dim) -> Tuple[Params, Dict]:
    ks = jax.random.split(rng, 7)
    params: Params = {
        "attn_fc_w": xavier_normal(ks[0], (1, 3 * h_dim), gain=RELU_GAIN),
        "pos_proj_w": xavier_normal(ks[1], (3 * h_dim, 3 * h_dim), gain=RELU_GAIN),
        "w_neighbor": xavier_uniform(ks[2], (h_dim, h_dim), gain=RELU_GAIN),
        "loop_w": xavier_uniform(ks[3], (h_dim, h_dim), gain=RELU_GAIN),
        "evolve_loop_w": xavier_uniform(ks[4], (h_dim, h_dim), gain=RELU_GAIN),
        # Conv1d(1->1, k=1): a scalar affine on the feature signal
        "conv_w": torch_linear_uniform(ks[5], (1,), 1),
        "conv_b": torch_linear_uniform(ks[6], (1,), 1),
    }
    bn_params, bn_state = _init_bn(1)
    params["bn0"] = bn_params
    return params, bn_state


def cand_rgcn_layer(
    params: Params,
    bn_state: Dict,
    h: jax.Array,  # [N, d]
    rel_emb: jax.Array,  # [2R, d]
    snap,  # history graph (flat padded edges)
    *,
    dropout: float = 0.2,
    rng=None,
    train: bool = False,
) -> Tuple[jax.Array, Dict]:
    n = h.shape[0]
    h_src = h[snap.src]
    h_dst = h[snap.dst]
    r_e = rel_emb[snap.rel]

    # edge attention logits (ref :106-109)
    z = jnp.concatenate([h_src, r_e, h_dst], axis=-1)
    a = z @ params["pos_proj_w"].T
    logits = (jax.nn.leaky_relu(a, negative_slope=0.01) @ params["attn_fc_w"].T)[:, 0]
    alpha = segment_softmax(logits, snap.dst, snap.edge_mask, n)

    # message: conv1d(1->1,k=1) over (h_src + r) then @ W (ref :86-99)
    x = (h_src + r_e)[:, None, :]  # [E, 1, d]
    x, new_bn = _batch_norm(params["bn0"], bn_state, x, snap.edge_mask, axis=1, train=train)
    x = x * params["conv_w"][0] + params["conv_b"][0]
    msg = x[:, 0, :] @ params["w_neighbor"]

    agg = jax.ops.segment_sum(msg * (alpha * snap.edge_mask)[:, None],
                              snap.dst, num_segments=n)

    loop_in = h @ params["loop_w"]
    loop_iso = h @ params["evolve_loop_w"]
    loop = jnp.where(snap.has_in_edge[:, None] > 0, loop_in, loop_iso)
    node_repr = agg + loop
    node_repr = rrelu(node_repr, None, train=False)
    if train and dropout > 0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1 - dropout, node_repr.shape)
        node_repr = jnp.where(keep, node_repr / (1 - dropout), 0.0)
    return node_repr, new_bn


def init_cand_cell(rng, h_dim, n_layers) -> Tuple[Params, list]:
    keys = jax.random.split(rng, n_layers)
    layers, bns = [], []
    for k in keys:
        p, s = init_cand_layer(k, h_dim)
        layers.append(p)
        bns.append(s)
    return {"layers": layers}, bns


def cand_cell(params, bn_states, h, rel_emb, snap, *, dropout=0.2, rng=None, train=False):
    x = h
    new_bns = []
    for i, (lp, bs) in enumerate(zip(params["layers"], bn_states)):
        k = jax.random.fold_in(rng, i) if rng is not None else None
        x, nb = cand_rgcn_layer(lp, bs, x, rel_emb, snap, dropout=dropout, rng=k, train=train)
        new_bns.append(nb)
    return x, new_bns
