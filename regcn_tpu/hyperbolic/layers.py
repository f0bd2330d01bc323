"""Hyperbolic GNN encoder layers (functional, pytree params).

Four encoder families, parity with ref:hyperbolic_src/hyperbolic_layers.py:

- ``hyperbolic_union_rgcn``  (ref :164-323) — tangent-space UnionRGCN with
  radius-gap message weighting exp(-γ|r_src - r_dst|), dual self-loop,
  ±10 tangent clamps.
- ``fhnn``  (ref :331-521) — per-relation Möbius matvec messages +
  Einstein-midpoint aggregation, Möbius self-loop.
- ``lgcn``  (ref :524-743) — block-decomposed tangent transform, messages
  aggregated as weighted Lorentz centroids on the hyperboloid.
- ``hgat``  (ref :746-975) — multi-head hyperbolic attention with logits
  from log_0(h_src ⊕ -h_dst), per-head Einstein midpoint, head averaging
  in tangent space.

All per-node Python loops in the reference's reduce functions
(ref :429-434, :620-625, :855-863 — its biggest single-chip inefficiency,
SURVEY.md §2.5) are replaced by flat segment reductions over the padded
edge arrays; attention softmax is a masked segment softmax.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from regcn_tpu.dist import HaloImpl, require_halo
from regcn_tpu.hyperbolic import ops as H
from regcn_tpu.ops.activations import rrelu
from regcn_tpu.ops.segment import segment_softmax
from regcn_tpu.utils.init import RELU_GAIN, xavier_uniform

Params = Dict[str, jax.Array]

CLAMP = 10.0  # tangent clamp (ref :296, :310, :672, :683)


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _dual_self_loop(params, h_tan, has_in_edge):
    loop_in = h_tan @ params["loop_w"]
    loop_iso = h_tan @ params["evolve_loop_w"]
    return jnp.where(has_in_edge[:, None] > 0, loop_in, loop_iso)


# --------------------------------------------------------------- UnionRGCN

def init_hyperbolic_union_layer(rng, h_dim, self_loop=True, skip_connect=False) -> Params:
    ks = jax.random.split(rng, 4)
    p = {"w_neighbor": xavier_uniform(ks[0], (h_dim, h_dim), gain=RELU_GAIN)}
    if self_loop:
        p["loop_w"] = xavier_uniform(ks[1], (h_dim, h_dim), gain=RELU_GAIN)
        p["evolve_loop_w"] = xavier_uniform(ks[2], (h_dim, h_dim), gain=RELU_GAIN)
    if skip_connect:
        p["skip_w"] = xavier_uniform(ks[3], (h_dim, h_dim), gain=RELU_GAIN)
        p["skip_b"] = jnp.zeros((h_dim,))
    return p



def _halo_aggregate(impl, params, v, rel_emb, snap, c, radius_gamma):
    """Boundary-halo shard_map aggregation of the radius-weighted union
    message (tangent-space rows). The per-edge radius weight
    ``exp(-gamma |r_src - r_dst|)`` is computed from per-ROW radii of the
    local + halo buffers (ref:hyperbolic_layers.py:229-236 semantics;
    the reference gathers per-edge, here it is O(rows) scalars)."""
    from regcn_tpu.parallel.halo import halo_rgcn_aggregate

    return halo_rgcn_aggregate(
        impl.mesh, v, rel_emb, params["w_neighbor"], require_halo(snap),
        row_scalar_fn=lambda rows: H.radius_from_tangent(rows, c),
        edge_weight_fn=lambda rs, rd: jnp.exp(
            -radius_gamma * jnp.abs(rs - rd)),
    )


def _agg_scatter(msg, snap, n, impl):
    """Masked-edge scatter-sum: XLA segment_sum or the Pallas MXU kernel
    (ops/pallas_rgcn.py; edges destination-sorted at snapshot build —
    Snapshot.dst_sorted — so no in-step argsort on that path)."""
    if impl == "pallas":
        from regcn_tpu.ops.pallas_rgcn import scatter_add_sorted

        dst_key = jnp.where(snap.edge_mask > 0, snap.dst, n)
        if getattr(snap, "dst_sorted", False):
            agg = scatter_add_sorted(msg.astype(jnp.float32), dst_key, n)
        else:
            order = jnp.argsort(dst_key)
            agg = scatter_add_sorted(
                msg[order].astype(jnp.float32), dst_key[order], n)
        return agg.astype(msg.dtype)
    return jax.ops.segment_sum(
        msg.astype(jnp.float32), snap.dst, num_segments=n
    ).astype(msg.dtype)


def hyperbolic_union_layer(
    params: Params,
    h_hyper: jax.Array,  # [N, d] on the ball
    rel_emb: jax.Array,  # [2R, d] tangent
    snap,
    c,
    *,
    prev_h: Optional[jax.Array] = None,  # ball points (previous layer input)
    radius_gamma: float = 1.0,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    n = h_hyper.shape[0]
    h_tan = H.log_map_zero(h_hyper, c)

    if isinstance(impl, HaloImpl):
        h_new = _halo_aggregate(impl, params, h_tan, rel_emb, snap, c,
                                radius_gamma)
    else:
        radius = H.get_radius(h_hyper)
        msg = (h_tan[snap.src] + rel_emb[snap.rel]) @ params["w_neighbor"]
        rw = jnp.exp(-radius_gamma * jnp.abs(radius[snap.src] - radius[snap.dst]))
        msg = msg * (rw * snap.edge_mask)[:, None]
        agg = _agg_scatter(msg, snap, n, impl)
        h_new = agg * snap.in_deg_norm[:, None].astype(agg.dtype)
    h_new = jnp.clip(h_new, -CLAMP, CLAMP)

    if "loop_w" in params:
        loop = _dual_self_loop(params, h_tan, snap.has_in_edge)
    if prev_h is not None and "skip_w" in params:
        prev_tan = H.log_map_zero(prev_h, c)
        gate = jax.nn.sigmoid(prev_tan @ params["skip_w"] + params["skip_b"])
        if "loop_w" in params:
            h_new = h_new + loop
        h_new = gate * h_new + (1 - gate) * prev_tan
    elif "loop_w" in params:
        h_new = h_new + loop

    h_new = jnp.clip(h_new, -CLAMP, CLAMP)
    h_new = rrelu(h_new, None, train=False)  # F.rrelu default training=False
    h_new = _dropout(h_new, dropout, rng, train)
    # dtype-preserving (CLAUDE invariant): fp32 islands inside, carry out
    return H.exp_map_zero(h_new, c).astype(h_hyper.dtype)


def union_layer_tangent(
    params: Params,
    v: jax.Array,  # [N, d] tangent vectors (= log_0 of the ball points)
    rel_emb: jax.Array,
    snap,
    c,
    *,
    prev_v: Optional[jax.Array] = None,  # tangent of previous layer input
    radius_gamma: float = 1.0,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    """Tangent-in/tangent-out :func:`hyperbolic_union_layer`.

    Identical math with the input log map and output exp map elided (the
    caller's carry already IS the tangent representation); the radius
    edge weights use :func:`H.radius_from_tangent`. Returns the RAW
    tangent output — the caller applies :func:`H.clamp_tangent_norm`,
    which reproduces the exp -> project -> log composition exactly.
    """
    n = v.shape[0]
    if isinstance(impl, HaloImpl):
        h_new = _halo_aggregate(impl, params, v, rel_emb, snap, c,
                                radius_gamma)
    else:
        radius = H.radius_from_tangent(v, c)
        msg = (v[snap.src] + rel_emb[snap.rel]) @ params["w_neighbor"]
        rw = jnp.exp(-radius_gamma * jnp.abs(radius[snap.src] - radius[snap.dst]))
        msg = msg * (rw * snap.edge_mask)[:, None]
        agg = _agg_scatter(msg, snap, n, impl)
        h_new = agg * snap.in_deg_norm[:, None].astype(agg.dtype)
    h_new = jnp.clip(h_new, -CLAMP, CLAMP)

    if "loop_w" in params:
        loop = _dual_self_loop(params, v, snap.has_in_edge)
    if prev_v is not None and "skip_w" in params:
        gate = jax.nn.sigmoid(prev_v @ params["skip_w"] + params["skip_b"])
        if "loop_w" in params:
            h_new = h_new + loop
        h_new = gate * h_new + (1 - gate) * prev_v
    elif "loop_w" in params:
        h_new = h_new + loop

    h_new = jnp.clip(h_new, -CLAMP, CLAMP)
    h_new = rrelu(h_new, None, train=False)
    return _dropout(h_new, dropout, rng, train)


def uvrgcn_cell_tangent(
    params: Params,
    v: jax.Array,
    rel_emb: jax.Array,
    snap,
    c,
    *,
    radius_gamma: float = 1.0,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    """Tangent-space layer stack matching :func:`encoder_cell` for
    ``hyperbolic_uvrgcn`` (same rng fold structure, so train-mode dropout
    masks are identical)."""
    x = v
    prev = None
    for i, lp in enumerate(params["layers"]):
        k = jax.random.fold_in(rng, i) if rng is not None else None
        new_x = union_layer_tangent(
            lp, x, rel_emb, snap, c,
            prev_v=prev if i > 0 else None,
            radius_gamma=radius_gamma, dropout=dropout, rng=k, train=train,
            impl=impl,
        )
        prev = x
        # between layers the ball path exp-maps then re-log-maps
        x = H.clamp_tangent_norm(new_x, c)
    return x


# --------------------------------------------------------------------- FHNN

def fhnn_edge_transform(rel_weight, tan_src, rel, mode: Optional[str] = None):
    """Per-edge relation matvec ``msg[e] = tan_src[e] @ W[rel[e]]``
    (ref:hyperbolic_layers.py:436-466 FHNN message).

    Two lowerings (round-5 measurement, docs/BENCHMARKS.md):

    - ``take``: gather ``[E, d, d]`` weights then batched matvec. Its
      backward is a scatter-add into ``[R, d, d]`` — the dominant cost of
      the fhnn step on TPU, and the op XLA constant-folds per shard
      program under shard_map (the round-4 halo-retention outlier).
    - ``onehot``: gather-as-GEMM — ``one_hot(rel) @ W.reshape(R, d²)``.
      Exact (0/1 weights pick rows bit-exactly); forward and backward are
      MXU GEMMs. Measured fwd+bwd on 1 v5e, d=200, R=230:
      1.46x / 1.47x / 2.19x faster at E=1k / 2k / 8k.

    ``mode=None`` selects ``onehot`` on TPU, ``take`` elsewhere (the CPU
    backend runs the gather ~2x faster than the GEMM).
    """
    if mode is None:
        mode = "onehot" if jax.default_backend() == "tpu" else "take"
    if mode == "onehot":
        nr = rel_weight.shape[0]
        oh = jax.nn.one_hot(rel, nr, dtype=tan_src.dtype)
        w_e = (oh @ rel_weight.reshape(nr, -1)).reshape(
            -1, *rel_weight.shape[1:])
    else:
        w_e = rel_weight[rel]
    return jnp.einsum("ed,edf->ef", tan_src, w_e)


def init_fhnn_layer(rng, h_dim, num_rels, self_loop=True) -> Params:
    ks = jax.random.split(rng, 2)
    # xavier on view(-1, out): fans = (R*d, d) (ref :361-362)
    bound = math.sqrt(6.0 / (num_rels * h_dim + h_dim))
    p = {
        "rel_weight": jax.random.uniform(
            ks[0], (num_rels, h_dim, h_dim), minval=-bound, maxval=bound
        )
    }
    if self_loop:
        p["loop_w"] = xavier_uniform(ks[1], (h_dim, h_dim))
    return p


def fhnn_layer(
    params: Params,
    h_hyper: jax.Array,
    rel_emb: Optional[jax.Array],
    snap,
    c,
    *,
    prev_h=None,  # unused, API compat (ref :444)
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    n = h_hyper.shape[0]
    h_tan = H.log_map_zero(h_hyper, c)

    # one message+aggregation definition for BOTH the dense and the halo
    # path (the Einstein midpoint is a weighted reduction over DESTINATION
    # segments, so with dst-partitioned edges it is shard-local — only the
    # source rows travel)
    def local_fn(hbuf, src, dst, mask, rel, norm, has_in, rows):
        tan = H.log_map_zero(hbuf, c)
        msg_tan = fhnn_edge_transform(params["rel_weight"], tan[src], rel)
        if rel_emb is not None:
            msg_tan = msg_tan + rel_emb[rel]
        msg_ball = H.exp_map_zero(msg_tan, c)
        return H.einstein_midpoint_segments(
            msg_ball, norm[dst] * mask, dst, rows, c)

    if isinstance(impl, HaloImpl):
        from regcn_tpu.parallel.halo import halo_local_aggregate

        h_agg = halo_local_aggregate(impl.mesh, h_hyper, require_halo(snap),
                                     local_fn)
    else:
        h_agg = local_fn(h_hyper, snap.src, snap.dst, snap.edge_mask,
                         snap.rel, snap.in_deg_norm, snap.has_in_edge, n)

    if "loop_w" in params:
        loop_ball = H.exp_map_zero(h_tan @ params["loop_w"], c)
        h_new = H.mobius_add(h_agg, loop_ball, c)
    else:
        h_new = h_agg

    # activation + dropout in tangent space (ref :466-475)
    t = H.log_map_zero(h_new, c)
    t = rrelu(t, None, train=False)
    h_new = H.exp_map_zero(t, c)
    if train and dropout > 0 and rng is not None:
        t = H.log_map_zero(h_new, c)
        t = _dropout(t, dropout, rng, train)
        h_new = H.exp_map_zero(t, c)
    # dtype-preserving (CLAUDE invariant): fp32 islands inside, carry out
    return h_new.astype(h_hyper.dtype)


# --------------------------------------------------------------------- LGCN

def init_lgcn_layer(rng, h_dim, num_rels, n_bases=-1, self_loop=True, skip_connect=False) -> Params:
    nb = num_rels if n_bases <= 0 else min(n_bases, num_rels)
    assert h_dim % nb == 0, f"h_dim {h_dim} must be divisible by n_bases {nb}"
    sub = h_dim // nb
    ks = jax.random.split(rng, 4)
    p = {
        "weight": xavier_uniform(ks[0], (num_rels, nb * sub * sub), gain=RELU_GAIN),
    }
    if self_loop:
        p["loop_w"] = xavier_uniform(ks[1], (h_dim, h_dim), gain=RELU_GAIN)
        p["evolve_loop_w"] = xavier_uniform(ks[2], (h_dim, h_dim), gain=RELU_GAIN)
    if skip_connect:
        p["skip_w"] = xavier_uniform(ks[3], (h_dim, h_dim), gain=RELU_GAIN)
        p["skip_b"] = jnp.zeros((h_dim,))
    return p


def lgcn_layer(
    params: Params,
    h_hyper: jax.Array,
    rel_emb: Optional[jax.Array],
    snap,
    c,
    n_bases: int,
    *,
    prev_h=None,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    n, d = h_hyper.shape
    nb = n_bases
    sub = d // nb
    h_tan = H.log_map_zero(h_hyper, c)

    # one message+aggregation definition for BOTH the dense and the halo
    # path (the weighted Lorentz centroid reduces over destination
    # segments — shard-local under the dst partition)
    def local_fn(hbuf, src, dst, mask, rel, norm, has_in, rows):
        tan = H.log_map_zero(hbuf, c)
        w_e = params["weight"][rel].reshape(-1, nb, sub, sub)
        src_feat = tan[src].reshape(-1, nb, sub)
        msg_tan = jnp.einsum("ebi,ebio->ebo", src_feat, w_e).reshape(-1, d)
        if rel_emb is not None:
            msg_tan = msg_tan + rel_emb[rel]
        msg_lorentz = H.to_lorentz(H.exp_map_zero(msg_tan, c), c)
        agg_lorentz = H.lorentz_centroid_segments(
            msg_lorentz, norm[dst] * mask, dst, rows, c)
        return H.log_map_zero(H.to_poincare(agg_lorentz, c), c)

    if isinstance(impl, HaloImpl):
        from regcn_tpu.parallel.halo import halo_local_aggregate

        h_new = halo_local_aggregate(impl.mesh, h_hyper, require_halo(snap),
                                     local_fn)
    else:
        h_new = local_fn(h_hyper, snap.src, snap.dst, snap.edge_mask,
                         snap.rel, snap.in_deg_norm, snap.has_in_edge, n)
    h_new = jnp.clip(h_new, -CLAMP, CLAMP)

    if "loop_w" in params:
        loop = _dual_self_loop(params, h_tan, snap.has_in_edge)
    if prev_h is not None and "skip_w" in params:
        prev_tan = H.log_map_zero(prev_h, c)
        gate = jax.nn.sigmoid(prev_tan @ params["skip_w"] + params["skip_b"])
        if "loop_w" in params:
            h_new = h_new + loop
        h_new = gate * h_new + (1 - gate) * prev_tan
    elif "loop_w" in params:
        h_new = h_new + loop

    h_new = jnp.clip(h_new, -CLAMP, CLAMP)
    h_new = rrelu(h_new, None, train=False)
    h_new = _dropout(h_new, dropout, rng, train)
    # dtype-preserving (CLAUDE invariant): fp32 islands inside, carry out
    return H.exp_map_zero(h_new, c).astype(h_hyper.dtype)


# --------------------------------------------------------------------- HGAT

def init_hgat_layer(rng, h_dim, num_rels, num_heads=4, self_loop=True, skip_connect=False) -> Params:
    head_dim = h_dim  # concat_heads=False in the reference cell (ref :948)
    ks = jax.random.split(rng, 4)
    bw = math.sqrt(6.0 / (num_rels * num_heads * h_dim + head_dim))
    bv = math.sqrt(6.0 / (num_rels * num_heads + head_dim))
    p = {
        "rel_weight": jax.random.uniform(
            ks[0], (num_rels, num_heads, h_dim, head_dim), minval=-bw, maxval=bw
        ),
        "attn_vec": jax.random.uniform(
            ks[1], (num_rels, num_heads, head_dim), minval=-bv, maxval=bv
        ),
    }
    if self_loop:
        p["loop_w"] = xavier_uniform(ks[2], (h_dim, h_dim))
    if skip_connect:
        p["skip_w"] = xavier_uniform(ks[3], (h_dim, h_dim))
        p["skip_b"] = jnp.zeros((h_dim,))
    return p


def hgat_layer(
    params: Params,
    h_hyper: jax.Array,
    rel_emb: Optional[jax.Array],  # unused in attention (ref :882)
    snap,
    c,
    *,
    num_heads: int = 4,
    prev_h=None,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    n, d = h_hyper.shape
    h_tan = H.log_map_zero(h_hyper, c)

    # one message+aggregation definition for BOTH the dense and the halo
    # path: attention logits need ball points of BOTH ends, but dst is
    # always local and the segment softmax + per-head Einstein midpoint
    # reduce over destination segments — shard-local; the same
    # (max, sumexp) locality as the sharded CE partials. Head averaging
    # is in tangent space (ref :867-871); head_dim == d so no slice.
    def local_fn(hbuf, src, dst, mask, rel, norm, has_in, rows):
        tan = H.log_map_zero(hbuf, c)
        w_e = params["rel_weight"][rel]  # [E, H, d, hd]
        msgs_tan = jnp.einsum("ed,ehdf->ehf", tan[src], w_e)  # [E, H, hd]
        msgs_ball = H.exp_map_zero(msgs_tan, c)
        diff = H.mobius_add(hbuf[src], -hbuf[dst], c)
        diff_tan = H.log_map_zero(diff, c)
        av = params["attn_vec"][rel]  # [E, H, hd]
        scores = jax.nn.leaky_relu(
            jnp.einsum("ehf,ef->eh", av, diff_tan), negative_slope=0.2)

        def head_agg(head_scores, head_msgs):
            alpha = segment_softmax(head_scores, dst, mask, rows)
            return H.einstein_midpoint_segments(
                head_msgs, alpha * mask, dst, rows, c)

        agg_heads = jax.vmap(head_agg, in_axes=(1, 1), out_axes=0)(
            scores, msgs_ball)  # [H, rows, hd]
        avg_tan = jnp.mean(H.log_map_zero(agg_heads, c), axis=0)
        return H.exp_map_zero(avg_tan, c)

    if isinstance(impl, HaloImpl):
        from regcn_tpu.parallel.halo import halo_local_aggregate

        h_new = halo_local_aggregate(impl.mesh, h_hyper, require_halo(snap),
                                     local_fn)
    else:
        h_new = local_fn(h_hyper, snap.src, snap.dst, snap.edge_mask,
                         snap.rel, snap.in_deg_norm, snap.has_in_edge, n)

    if "loop_w" in params:
        loop_ball = H.exp_map_zero(h_tan @ params["loop_w"], c)
        h_new = H.mobius_add(h_new, loop_ball, c)
    if prev_h is not None and "skip_w" in params:
        prev_tan = H.log_map_zero(prev_h, c)
        t = H.log_map_zero(h_new, c)
        gate = jax.nn.sigmoid(prev_tan @ params["skip_w"] + params["skip_b"])
        t = gate * t + (1 - gate) * prev_tan
        h_new = H.exp_map_zero(t, c)

    t = H.log_map_zero(h_new, c)
    t = rrelu(t, None, train=False)
    h_new = H.exp_map_zero(t, c)
    if train and dropout > 0 and rng is not None:
        t = H.log_map_zero(h_new, c)
        t = _dropout(t, dropout, rng, train)
        h_new = H.exp_map_zero(t, c)
    # dtype-preserving (CLAUDE invariant): fp32 islands inside, carry out
    return h_new.astype(h_hyper.dtype)


# --------------------------------------------------------------------- cells

ENCODERS = ("hyperbolic_uvrgcn", "fhnn", "lgcn", "hgat")


def init_encoder_cell(
    rng, encoder: str, h_dim: int, num_rels_total: int, n_layers: int,
    n_bases: int = -1, num_heads: int = 4,
    self_loop: bool = True, skip_connect: bool = False,
) -> Params:
    """Layer stack for any of the 4 encoders (ref cells :480-521, :697-743,
    :928-975 and HyperbolicRGCNCell)."""
    keys = jax.random.split(rng, n_layers)
    layers = []
    for i in range(n_layers):
        sc = skip_connect and i > 0
        if encoder == "hyperbolic_uvrgcn":
            layers.append(init_hyperbolic_union_layer(keys[i], h_dim, self_loop, sc))
        elif encoder == "fhnn":
            layers.append(init_fhnn_layer(keys[i], h_dim, num_rels_total, self_loop))
        elif encoder == "lgcn":
            layers.append(init_lgcn_layer(keys[i], h_dim, num_rels_total, n_bases, self_loop, sc))
        elif encoder == "hgat":
            layers.append(init_hgat_layer(keys[i], h_dim, num_rels_total, num_heads, self_loop, sc))
        else:
            raise ValueError(f"unknown encoder {encoder!r}; known: {ENCODERS}")
    return {"layers": layers}


def encoder_cell(
    params: Params,
    encoder: str,
    h_hyper: jax.Array,
    rel_emb: jax.Array,
    snap,
    c,
    *,
    n_bases: int = -1,
    num_heads: int = 4,
    radius_gamma: float = 1.0,
    dropout: float = 0.0,
    rng=None,
    train: bool = False,
    impl: str = "xla",
) -> jax.Array:
    x = h_hyper
    prev = None
    for i, lp in enumerate(params["layers"]):
        k = jax.random.fold_in(rng, i) if rng is not None else None
        kwargs = dict(prev_h=prev if i > 0 else None, dropout=dropout, rng=k, train=train)
        if encoder == "hyperbolic_uvrgcn":
            new_x = hyperbolic_union_layer(
                lp, x, rel_emb, snap, c, radius_gamma=radius_gamma,
                impl=impl, **kwargs
            )
        elif encoder == "fhnn":
            new_x = fhnn_layer(lp, x, rel_emb, snap, c, impl=impl, **kwargs)
        elif encoder == "lgcn":
            # n_bases is recoverable from the weight shape:
            # cols = nb * (d/nb)^2 = d^2 / nb
            d = x.shape[1]
            nb_eff = d * d // lp["weight"].shape[1]
            new_x = lgcn_layer(lp, x, rel_emb, snap, c, nb_eff, impl=impl, **kwargs)
        elif encoder == "hgat":
            new_x = hgat_layer(lp, x, rel_emb, snap, c, num_heads=num_heads,
                               impl=impl, **kwargs)
        else:
            raise ValueError(encoder)
        prev = x
        x = new_x
    return x
