"""GNN encoder layers (functional, pytree params).

- :func:`union_rgcn_layer` — the core aggregation layer, parity with
  ref:rgcn/layers.py:182-279 ``UnionRGCNLayer``: edge message
  ``(h_src + rel_emb[type]) @ W``, in-degree-normalised sum reduce, dual
  self-loop (``loop_weight`` for nodes with incoming edges,
  ``evolve_loop_weight`` for isolated ones), optional sigmoid-gated skip
  connection, rrelu + dropout. The reference's hard-coded ``.cuda()`` at
  ref:rgcn/layers.py:229-231 (which breaks CPU runs) is an accidental
  divergence we do not reproduce.
- :func:`rgcn_block_layer` — block-diagonal relation-specific transform
  used for the static entity-word graph, parity with
  ref:rgcn/layers.py:147-179 ``RGCNBlockLayer``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from regcn_tpu.config import ModelConfig
from regcn_tpu.dist import HaloImpl, require_halo
from regcn_tpu.ops.activations import rrelu
from regcn_tpu.ops.rgcn_scatter import rgcn_aggregate
from regcn_tpu.ops.segment import masked_segment_sum
from regcn_tpu.utils.init import RELU_GAIN, xavier_uniform

Params = Dict[str, jax.Array]

# elements (not bytes) allowed for the basis layer's gathered [B, E, out]
# temporary before switching to the scanned low-memory order (~512 MB fp32)
_BASIS_FUSE_ELEMS = 1 << 27


def init_union_rgcn_layer(
    rng: jax.Array, h_dim: int, self_loop: bool = True, skip_connect: bool = False
) -> Params:
    ks = jax.random.split(rng, 4)
    p: Params = {"w_neighbor": xavier_uniform(ks[0], (h_dim, h_dim), gain=RELU_GAIN)}
    if self_loop:
        p["loop_w"] = xavier_uniform(ks[1], (h_dim, h_dim), gain=RELU_GAIN)
        p["evolve_loop_w"] = xavier_uniform(ks[2], (h_dim, h_dim), gain=RELU_GAIN)
    if skip_connect:
        p["skip_w"] = xavier_uniform(ks[3], (h_dim, h_dim), gain=RELU_GAIN)
        p["skip_b"] = jnp.zeros((h_dim,))
    return p


def union_rgcn_layer(
    params: Params,
    h: jax.Array,  # [N, d]
    rel_emb: jax.Array,  # [2R, d] evolved relation embeddings for this layer
    snap,  # Snapshot pytree (single step: arrays without time axis)
    *,
    prev_h: Optional[jax.Array] = None,  # for skip connect (layer >= 1)
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    if isinstance(impl, HaloImpl):
        # explicit shard_map boundary-halo aggregation over the mesh;
        # requires halo-partitioned edges in the snapshot (loud failure —
        # no silent fallback to the dense gather)
        from regcn_tpu.parallel.halo import halo_rgcn_aggregate

        agg = halo_rgcn_aggregate(
            impl.mesh, h, rel_emb, params["w_neighbor"], require_halo(snap))
    else:
        agg = rgcn_aggregate(
            h, rel_emb, params["w_neighbor"], snap.src, snap.dst, snap.rel,
            snap.edge_mask, snap.in_deg_norm, impl=impl,
            dst_sorted=getattr(snap, "dst_sorted", False),
        )
    node_repr = agg
    if "loop_w" in params:
        # dual self-loop: evolve_loop_weight for isolated nodes
        # (ref:rgcn/layers.py:226-233)
        # fp32 MXU accumulation, result back in the compute dtype
        loop_in = jnp.dot(
            h, params["loop_w"], preferred_element_type=jnp.float32
        ).astype(h.dtype)
        loop_iso = jnp.dot(
            h, params["evolve_loop_w"], preferred_element_type=jnp.float32
        ).astype(h.dtype)
        loop = jnp.where(snap.has_in_edge[:, None] > 0, loop_in, loop_iso)
        node_repr = node_repr + loop
    if prev_h is not None and "skip_w" in params:
        # sigmoid-gated skip across layers (ref:rgcn/layers.py:234-245)
        gate = jax.nn.sigmoid(prev_h @ params["skip_w"] + params["skip_b"])
        node_repr = gate * node_repr + (1.0 - gate) * prev_h
    # NOTE: the reference invokes F.rrelu functionally with its default
    # training=False (ref:src/rrgcn.py:16, rgcn/layers.py:250-251), so the
    # activation is ALWAYS the deterministic fixed-slope leaky relu — we
    # match that rather than sampling slopes.
    node_repr = rrelu(node_repr, None, train=False)
    if train and dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, node_repr.shape)
        node_repr = jnp.where(keep, node_repr / (1.0 - dropout), 0.0)
    return node_repr


def init_rgcn_cell(
    rng: jax.Array, cfg: ModelConfig
) -> Params:
    """Stack of n_layers UnionRGCN layers (ref:src/rrgcn.py:14-54 RGCNCell)."""
    keys = jax.random.split(rng, cfg.n_layers)
    layers = []
    for i in range(cfg.n_layers):
        sc = cfg.skip_connect and i > 0  # ref:src/rrgcn.py:21-24
        layers.append(
            init_union_rgcn_layer(keys[i], cfg.h_dim, cfg.self_loop, sc)
        )
    return {"layers": layers}


def rgcn_cell(
    params: Params,
    h: jax.Array,
    rel_emb: jax.Array,
    snap,
    cfg: ModelConfig,
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    x = h
    prev = None
    for i, lp in enumerate(params["layers"]):
        k = jax.random.fold_in(rng, i) if rng is not None else None
        sc_prev = prev if (cfg.skip_connect and i > 0) else None
        new_x = union_rgcn_layer(
            lp, x, rel_emb, snap,
            prev_h=sc_prev, dropout=cfg.dropout, rng=k, train=train, impl=impl,
        )
        prev = x
        x = new_x
    return x


def init_rgcn_block_layer(
    rng: jax.Array, h_dim: int, num_rels: int, n_bases: int
) -> Params:
    assert h_dim % n_bases == 0, "h_dim must divide n_bases for block layer"
    sub = h_dim // n_bases
    w = xavier_uniform(rng, (num_rels, n_bases * sub * sub), gain=RELU_GAIN)
    return {"weight": w}


def rgcn_block_layer(
    params: Params,
    h: jax.Array,  # [N_total, d] (entities ++ words for the static graph)
    snap,
    n_bases: int,
    *,
    rng: Optional[jax.Array] = None,
    dropout: float = 0.0,
    train: bool = False,
) -> jax.Array:
    """Block-diagonal relation-typed aggregation (static word graph).

    msg_e = blockdiag(W[rel_e]) @ h[src_e]; reduce = sum * 1/in_deg;
    rrelu activation, no self-loop (ref:rgcn/layers.py:167-179,
    instantiated at ref:src/rrgcn.py:104-105 with activation=F.rrelu).
    """
    n = h.shape[0]
    d = h.shape[1]
    sub = d // n_bases
    w_e = params["weight"][snap.rel].reshape(-1, n_bases, sub, sub)
    h_src = h[snap.src].reshape(-1, n_bases, sub)
    msg = jnp.einsum("ebi,ebio->ebo", h_src, w_e).reshape(-1, d)
    agg = masked_segment_sum(msg, snap.dst, snap.edge_mask, n)
    agg = agg * snap.in_deg_norm[:, None].astype(agg.dtype)
    agg = rrelu(agg, None, train=False)  # F.rrelu default training=False
    if train and dropout > 0.0 and rng is not None:
        k = jax.random.fold_in(rng, 1)
        keep = jax.random.bernoulli(k, 1.0 - dropout, agg.shape)
        agg = jnp.where(keep, agg / (1.0 - dropout), 0.0)
    return agg


def init_rgcn_basis_layer(
    rng: jax.Array, in_feat: int, out_feat: int, num_rels: int,
    num_bases: int = -1, bias: bool = False,
) -> Params:
    """Legacy basis-decomposition layer (ref:rgcn/layers.py:96-144).

    Not on the reference's main temporal path (used by its legacy RDF
    entity-classification stack); provided for library parity.
    """
    if num_bases <= 0 or num_bases > num_rels:
        num_bases = num_rels
    ks = jax.random.split(rng, 3)
    p: Params = {
        "weight": xavier_uniform(ks[0], (num_bases, in_feat, out_feat),
                                 gain=RELU_GAIN)
    }
    if num_bases < num_rels:
        p["w_comp"] = xavier_uniform(ks[1], (num_rels, num_bases), gain=RELU_GAIN)
    if bias:
        p["bias"] = xavier_uniform(ks[2], (1, out_feat), gain=RELU_GAIN)[0]
    return p


def rgcn_basis_layer(
    params: Params,
    h: jax.Array,  # [N, in_feat]; ignored when input_layer=True
    snap,
    *,
    input_layer: bool = False,
    activation=None,
) -> jax.Array:
    """Basis-decomposed relation-typed aggregation (ref:rgcn/layers.py:118-144).

    Reference semantics: msg_e = h[src_e] @ W[rel_e] with
    W[r] = sum_b w_comp[r,b] * basis_b, reduce = sum * in-degree norm,
    then bias + activation. The reference materialises a per-edge [d,d]
    weight and runs a batched matmul per edge (ref :137-139); here the
    basis trick is applied the MXU-friendly way round: B dense GEMMs
    P_b = h @ basis_b over all nodes, then per-edge combine
    msg_e = sum_b comp[rel_e, b] * P_b[src_e] — identical numerics,
    no [E, d, d] tensor.

    input_layer=True reproduces the reference's featureless input mode
    (ref :129-134): node features are implicit one-hot ids, so the
    message is the embedding-table row ``weight[rel_e, src_e]``.
    """
    n = h.shape[0]
    weight = params["weight"]  # [B, in, out]
    num_bases, out_feat = weight.shape[0], weight.shape[-1]
    n_edges = snap.src.shape[0]

    def combine_bases(tables):  # tables: [B, N, out] (gatherable per base)
        """msg_e = sum_b comp[rel_e, b] * tables[b, src_e].

        Two orderings with identical numerics: a single einsum over the
        gathered [B, E, out] block (fastest when it fits), or a scan over
        bases with an [E, out] accumulator (peak memory E*out instead of
        B*E*out — for am-scale graphs the gathered block alone is tens of
        GB, so the small-temporary order is load-bearing, not a tweak)."""
        comp = params["w_comp"][snap.rel]  # [E, B]
        if num_bases * n_edges * out_feat <= _BASIS_FUSE_ELEMS:
            per_edge = tables[:, snap.src, :]  # [B, E, out]
            return jnp.einsum("eb,beo->eo", comp, per_edge)

        def step(acc, inputs):
            table_b, comp_b = inputs  # [N, out], [E]
            return acc + comp_b[:, None] * table_b[snap.src], None

        init = jnp.zeros((n_edges, out_feat), tables.dtype)
        msg, _ = jax.lax.scan(step, init, (tables, comp.T))
        return msg

    if input_layer:
        # featureless mode: the message is row (rel_e, src_e) of the
        # composed weight — never materialise the [R, N, out] composed
        # tensor (for am-scale graphs that is tens of GB, defeating the
        # basis trick)
        if "w_comp" in params:
            msg = combine_bases(weight)
        else:
            # num_bases == num_rels: direct double gather, no contraction
            msg = weight[snap.rel, snap.src]
    else:
        proj = jnp.einsum("ni,bio->bno", h, weight)  # B GEMMs on the MXU
        if "w_comp" in params:
            msg = combine_bases(proj)
        else:
            msg = proj[snap.rel, snap.src]
    agg = masked_segment_sum(msg, snap.dst, snap.edge_mask, n)
    agg = agg * snap.in_deg_norm[:, None].astype(agg.dtype)
    if "bias" in params:
        agg = agg + params["bias"]
    if activation is not None:
        agg = activation(agg)
    return agg


def init_gru_cell(rng: jax.Array, input_size: int, hidden_size: int) -> Params:
    """torch nn.GRUCell parameterisation (ref:src/rrgcn.py:133)."""
    from regcn_tpu.utils.init import gru_uniform

    ks = jax.random.split(rng, 4)
    return {
        "w_ih": gru_uniform(ks[0], (3 * hidden_size, input_size), hidden_size),
        "w_hh": gru_uniform(ks[1], (3 * hidden_size, hidden_size), hidden_size),
        "b_ih": gru_uniform(ks[2], (3 * hidden_size,), hidden_size),
        "b_hh": gru_uniform(ks[3], (3 * hidden_size,), hidden_size),
    }


def gru_cell(params: Params, x: jax.Array, h: jax.Array) -> jax.Array:
    """torch GRUCell semantics: r/z gates then candidate with reset on h."""
    hs = h.shape[-1]
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h
