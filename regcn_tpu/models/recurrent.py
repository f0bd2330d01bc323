"""RecurrentRGCN — the framework core model.

Parity with ref:src/rrgcn.py:58-248 ``RecurrentRGCN``, re-designed as a
pure function over an immutable parameter pytree:

- the reference mutates ``self.h``/``self.h_0`` across its Python
  snapshot loop (ref:src/rrgcn.py:159-179); here the evolution step is a
  single function scanned with ``lax.scan`` over a stacked
  ``[T, ...]`` history window (static shapes, one compilation);
- relation-context pooling is a masked segment-mean instead of a Python
  loop over relation spans (ref:src/rrgcn.py:161-166);
- the static-graph initialisation and angular constraint loss
  (ref:src/rrgcn.py:146-155, :225-247) are optional, as in the reference.

Evolution step (one snapshot):
  ctx[r]   = mean_{e incident to r} h[e]                  (segment mean)
  h0       = GRUCell([emb_rel ; ctx], h0)                 (relation GRU)
  cur      = RGCNCell(g, h, h0)                           (2 x UnionRGCN)
  gate     = sigmoid(h @ W_t + b_t)
  h        = gate * cur + (1-gate) * h                    (time gate)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regcn_tpu.config import ModelConfig
from regcn_tpu.models import decoders
from regcn_tpu.models.layers import (
    gru_cell,
    init_gru_cell,
    init_rgcn_block_layer,
    init_rgcn_cell,
    rgcn_block_layer,
    rgcn_cell,
)
from regcn_tpu.ops.activations import l2_normalize
from regcn_tpu.ops.segment import masked_segment_mean
from regcn_tpu.utils.init import xavier_normal, xavier_uniform

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelState:
    """Non-parameter model state: decoder BatchNorm running stats."""

    bn_ob: decoders.BNState
    bn_rel: decoders.BNState


def init_params(rng: jax.Array, cfg: ModelConfig) -> Tuple[Params, ModelState]:
    ks = jax.random.split(rng, 10)
    params: Params = {
        "emb_rel": xavier_normal(ks[0], (cfg.num_rels_total, cfg.h_dim)),
        "dynamic_emb": jax.random.normal(ks[1], (cfg.num_ents, cfg.h_dim)),
        "time_gate_w": xavier_uniform(ks[2], (cfg.h_dim, cfg.h_dim), gain=math.sqrt(2.0)),
        "time_gate_b": jnp.zeros((cfg.h_dim,)),
        "gru": init_gru_cell(ks[3], 2 * cfg.h_dim, cfg.h_dim),
        "rgcn": init_rgcn_cell(ks[4], cfg),
    }
    dec_ob, bn_ob = decoders.init_convtrans(ks[5], cfg.h_dim, cfg.decoder_channels, cfg.decoder_kernel)
    dec_rel, bn_rel = decoders.init_convtrans(ks[6], cfg.h_dim, cfg.decoder_channels, cfg.decoder_kernel)
    params["decoder_ob"] = dec_ob
    params["decoder_rel"] = dec_rel
    if cfg.use_static:
        params["words_emb"] = xavier_normal(ks[7], (cfg.num_words, cfg.h_dim))
        params["static_rgcn"] = init_rgcn_block_layer(
            ks[8], cfg.h_dim, cfg.num_static_rels * 2, cfg.n_bases
        )
    return params, ModelState(bn_ob=bn_ob, bn_rel=bn_rel)


def _static_init(params, cfg: ModelConfig, static_snap, rng, train):
    """Static word-graph init of entity state (ref:src/rrgcn.py:146-152)."""
    h_all = jnp.concatenate([params["dynamic_emb"], params["words_emb"]], axis=0)
    out = rgcn_block_layer(
        params["static_rgcn"], h_all, static_snap, cfg.n_bases,
        rng=rng, dropout=cfg.dropout, train=train,
    )
    static_emb = out[: cfg.num_ents]
    if cfg.layer_norm:
        static_emb = l2_normalize(static_emb)
    return static_emb


def evolve(
    params: Params,
    cfg: ModelConfig,
    history,  # SnapshotBatch pytree with leading [T] axis on array fields
    *,
    static_snap=None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    impl: str = "xla",
    return_all: bool = False,
):
    """Run the recurrent evolution over the history window.

    Returns (h_final, r_emb_final, static_emb, all_h optional [T, N, d]).
    """
    if cfg.use_static and static_snap is not None:
        k_static = jax.random.fold_in(rng, 997) if rng is not None else None
        static_emb = _static_init(params, cfg, static_snap, k_static, train)
        h_init = static_emb
    else:
        static_emb = None
        h_init = (
            l2_normalize(params["dynamic_emb"]) if cfg.layer_norm else params["dynamic_emb"]
        )

    emb_rel = params["emb_rel"]
    num_rels_total = cfg.num_rels_total

    def step(carry, inputs):
        h, h0 = carry
        step_idx, snap = inputs
        k = jax.random.fold_in(rng, step_idx) if rng is not None else None
        # relation context: masked segment-mean of current entity states over
        # the (relation, incident-entity) pair list
        ctx = masked_segment_mean(h[snap.rc_ent], snap.rc_rel, snap.rc_mask, num_rels_total)
        x_input = jnp.concatenate([emb_rel, ctx], axis=1)
        h0_new = gru_cell(params["gru"], x_input, h0)
        if cfg.layer_norm:
            h0_new = l2_normalize(h0_new)
        cur = rgcn_cell(params["rgcn"], h, h0_new, snap, cfg, rng=k, train=train, impl=impl)
        if cfg.layer_norm:
            cur = l2_normalize(cur)
        gate = jax.nn.sigmoid(h @ params["time_gate_w"] + params["time_gate_b"])
        h_new = gate * cur + (1.0 - gate) * h
        # empty (all-masked) snapshots are identity steps: this lets the
        # fused-epoch scan front-pad short history windows with empty
        # snapshots and still match the reference's shorter-window
        # semantics exactly (real snapshots always have >=1 edge)
        active = jnp.max(snap.edge_mask) > 0
        h_new = jnp.where(active, h_new, h)
        h0_new = jnp.where(active, h0_new, h0)
        return (h_new, h0_new), (h_new if return_all else 0.0)

    T = history.src.shape[0]
    # scan over the time axis of every array field of the Snapshot pytree;
    # the short history axis (T = history_len) is fully unrolled so XLA
    # fuses across steps (the training step is op-count-bound)
    (h_final, h0_final), ys = jax.lax.scan(
        step, (h_init, emb_rel), (jnp.arange(T), history), unroll=True
    )
    all_h = ys if return_all else None
    return h_final, h0_final, static_emb, all_h


def _masked_ce(scores: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean cross-entropy over valid rows (torch CrossEntropyLoss parity)."""
    scores = scores.astype(jnp.float32)  # CE always reduces in fp32
    logz = jax.nn.logsumexp(scores, axis=1)
    ll = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    nll = (logz - ll) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)


def static_angular_loss(
    static_emb: jax.Array, all_h: jax.Array, cfg: ModelConfig,
    active: Optional[jax.Array] = None,
) -> jax.Array:
    """Angular constraint between static and evolved embeddings.

    Parity with ref:src/rrgcn.py:225-247: per history step t (1-indexed),
    penalise max(0, cos(angle*t) - cos_sim(static, evolved)); with
    discount=0 the angle does not grow with t.

    ``active`` ([T] {0,1}) marks real history steps when the window was
    front-padded with empty snapshots: inactive steps contribute nothing
    and step numbering counts active steps only, matching the reference's
    shorter-window loss exactly.
    """
    T = all_h.shape[0]
    if active is None:
        steps = jnp.arange(1, T + 1, dtype=jnp.float32)
    else:
        active = active.astype(jnp.float32)
        steps = jnp.cumsum(active)
    if cfg.discount == 0:
        steps = jnp.ones_like(steps)
    angles = jnp.cos(cfg.angle * jnp.pi / 180.0 * steps)  # [T]

    if cfg.layer_norm:
        evo = l2_normalize(all_h, axis=-1)
        sim = jnp.sum(static_emb[None] * evo, axis=-1)  # [T, N]
    else:
        num = jnp.sum(static_emb[None] * all_h, axis=-1)
        den = (
            jnp.linalg.norm(static_emb, axis=-1)[None]
            * jnp.linalg.norm(all_h, axis=-1)
        )
        sim = num / jnp.maximum(den, 1e-12)
    gap = angles[:, None] - sim
    gap = jnp.where(gap > 0, gap, 0.0)
    if active is not None:
        gap = gap * active[:, None]
    return cfg.static_weight * jnp.sum(gap)


def get_loss(
    params: Params,
    state: ModelState,
    cfg: ModelConfig,
    history,
    triples: jax.Array,  # [B, 3] padded, inverses already added
    triple_mask: jax.Array,  # [B]
    *,
    static_snap=None,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    impl: str = "xla",
) -> Tuple[jax.Array, Dict[str, jax.Array], ModelState]:
    """Entity + relation + static losses (ref:src/rrgcn.py:197-248)."""
    k_fwd = k_ob = k_rel = None
    if rng is not None:
        k_fwd, k_ob, k_rel = jax.random.split(rng, 3)
    h, r_emb, static_emb, all_h = evolve(
        params, cfg, history, static_snap=static_snap, rng=k_fwd, train=train,
        impl=impl, return_all=cfg.use_static,
    )
    pre_emb = l2_normalize(h) if cfg.layer_norm else h

    zero = jnp.zeros(())
    loss_ent = loss_rel = loss_static = zero
    new_bn_ob, new_bn_rel = state.bn_ob, state.bn_rel

    if cfg.entity_prediction:
        scores_ob, new_bn_ob = decoders.convtranse_score(
            params["decoder_ob"], state.bn_ob, pre_emb, r_emb, triples, triple_mask,
            input_dropout=cfg.input_dropout, hidden_dropout=cfg.hidden_dropout,
            feat_dropout=cfg.feat_dropout, rng=k_ob, train=train,
        )
        loss_ent = _masked_ce(scores_ob, triples[:, 2], triple_mask)

    if cfg.relation_prediction:
        # candidates are the EVOLVED relation embeddings (ref:src/rrgcn.py:222)
        scores_rel, new_bn_rel = decoders.convtransr_score(
            params["decoder_rel"], state.bn_rel, pre_emb, r_emb, triples,
            triple_mask,
            input_dropout=cfg.input_dropout, hidden_dropout=cfg.hidden_dropout,
            feat_dropout=cfg.feat_dropout, rng=k_rel, train=train,
        )
        loss_rel = _masked_ce(scores_rel, triples[:, 1], triple_mask)

    if cfg.use_static and static_emb is not None and all_h is not None:
        active = (jnp.max(history.edge_mask, axis=1) > 0).astype(jnp.float32)
        loss_static = static_angular_loss(static_emb, all_h, cfg, active=active)

    losses = {"entity": loss_ent, "relation": loss_rel, "static": loss_static}
    return loss_ent, losses, ModelState(bn_ob=new_bn_ob, bn_rel=new_bn_rel)


def predict(
    params: Params,
    state: ModelState,
    cfg: ModelConfig,
    history,
    triples: jax.Array,  # [B, 3] with inverses, padded
    triple_mask: jax.Array,
    *,
    static_snap=None,
    impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode scores (ref:src/rrgcn.py:183-194): (ent [B,N], rel [B,2R])."""
    h, r_emb, _, _ = evolve(
        params, cfg, history, static_snap=static_snap, rng=None, train=False, impl=impl
    )
    emb = l2_normalize(h) if cfg.layer_norm else h
    scores_ob, _ = decoders.convtranse_score(
        params["decoder_ob"], state.bn_ob, emb, r_emb, triples, triple_mask, train=False
    )
    scores_rel, _ = decoders.convtransr_score(
        params["decoder_rel"], state.bn_rel, emb, r_emb, triples,
        triple_mask, train=False,
    )
    return scores_ob, scores_rel
