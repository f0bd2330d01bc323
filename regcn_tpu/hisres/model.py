"""HisRES recurrent model.

Parity with ref:hisres_src/hisres.py:102-451 ``RecurrentRGCN``:

- two recurrent streams — per-snapshot graphs through ``rgcn`` +
  entity/relation GRU pair 1 with a LogCL-style cosine time encoding,
  and 2-snapshot-union graphs through ``rgcn_2`` + GRU pair 2 — fused by
  a learned sigmoid gate (ref :272-333);
- query-conditioned history graphs (from precomputed sparse history)
  encoded by attention CandRGCN cells (raw + inverse) and gated into the
  final embeddings (ref :337-349);
- TimeConvTransE/R decoders whose outputs can be masked by one-hot
  history vocabularies (ref:hisres_src/decoder.py:46-51, :95-99);
  entity loss = 0.5*raw + 0.5*inverse CE; relation score =
  history_rate * masked + (1-history_rate) * raw (ref :351-363).

Note: the reference's checked-in ``hisres_src/model.py`` is stale and its
cells cannot be constructed as committed (SURVEY.md §2.4); this module
implements the intended behavior.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regcn_tpu.hisres import layers as HLayers
from regcn_tpu.models import decoders as D
from regcn_tpu.models.layers import gru_cell, init_gru_cell, init_rgcn_block_layer, rgcn_block_layer
from regcn_tpu.ops.activations import l2_normalize
from regcn_tpu.ops.segment import masked_segment_mean
from regcn_tpu.utils.init import torch_linear_uniform, xavier_normal, xavier_uniform

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HisResConfig:
    num_ents: int
    num_rels: int
    h_dim: int = 200
    n_layers: int = 2
    history_rate: float = 0.3
    dropout: float = 0.2
    input_dropout: float = 0.2
    hidden_dropout: float = 0.2
    feat_dropout: float = 0.2
    self_loop: bool = True
    skip_connect: bool = False
    layer_norm: bool = True
    entity_prediction: bool = True
    relation_prediction: bool = True
    use_static: bool = False
    num_static_rels: int = 0
    num_words: int = 0
    n_bases: int = 100
    static_weight: float = 0.5
    discount: float = 1.0
    angle: float = 10.0
    cand_dropout: float = 0.2  # fixed in the reference cell (ref :70-71)
    # relation-context incidence semantics for BOTH recurrent streams.
    # The HisRES variant's r2e adds ONLY the source entity
    # (ref:hisres_rgcn/utils.py:77-80 — no dst, unlike the baseline
    # rgcn/utils.py:78-97), so "src" is reference parity and the
    # default; "both" is the baseline-r2e variant this framework
    # shipped through round 3 (the cause of the round-3 entity −0.014
    # refrun residual — see tests/test_hisres_model_golden.py).
    rc_mode: str = "src"
    # bfloat16 activations/weights on the compute path; parameters,
    # optimizer, BN statistics and CE reductions stay fp32
    compute_dtype: str = "float32"
    # aggregation backend for the two recurrent streams: "xla" or a
    # dist.HaloImpl (boundary-halo shard_map over a mesh). The candidate
    # cells stay on the dense path either way (their query-conditioned
    # graphs are gathered per batch, not entity-partitioned).
    impl: Any = "xla"

    @property
    def num_rels_total(self) -> int:
        return 2 * self.num_rels


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HisResState:
    """BatchNorm states: 4 decoders + cand cells (raw/inv)."""

    bn_ob_raw: Any
    bn_ob_inv: Any
    bn_rel_raw: Any
    bn_rel_his: Any
    bn_cand_raw: Any
    bn_cand_inv: Any


def init_params(rng: jax.Array, cfg: HisResConfig) -> Tuple[Params, HisResState]:
    ks = jax.random.split(rng, 20)
    d = cfg.h_dim
    params: Params = {
        "emb_rel": xavier_normal(ks[0], (cfg.num_rels_total, d)),
        "dynamic_emb": jax.random.normal(ks[1], (cfg.num_ents, d)),
        # r_linear: initial relation mix (ref :143)
        "r_linear_w": torch_linear_uniform(ks[2], (d, 2 * d), 2 * d),
        "r_linear_b": torch_linear_uniform(ks[3], (d,), 2 * d),
        # LogCL-style time encoding (ref :148-154)
        "time_linear_w": torch_linear_uniform(ks[4], (d, 2 * d), 2 * d),
        "time_linear_b": torch_linear_uniform(ks[5], (d,), 2 * d),
        "weight_t2": jax.random.normal(ks[6], (1, d)),
        "bias_t2": jax.random.normal(ks[7], (1, d)),
        # fusion gates (ref :156-158)
        "linear_g_w": torch_linear_uniform(ks[8], (d, d), d),
        "linear_g_b": jnp.zeros((d,)),
        "linear_s1_w": torch_linear_uniform(ks[9], (d, d), d),
        "linear_s1_b": jnp.zeros((d,)),
        "linear_o1_w": torch_linear_uniform(ks[10], (d, d), d),
        "linear_o1_b": jnp.zeros((d,)),
        # GRU pairs (ref :236-240)
        "relation_cell_1": init_gru_cell(ks[11], 2 * d, d),
        "entity_cell_1": init_gru_cell(ks[12], d, d),
        "relation_cell_2": init_gru_cell(ks[13], 2 * d, d),
        "entity_cell_2": init_gru_cell(ks[14], d, d),
        "rgcn": HLayers.init_hisres_rgcn_cell(ks[15], d, cfg.n_layers, cfg.self_loop, cfg.skip_connect),
        "rgcn_2": HLayers.init_hisres_rgcn_cell(ks[16], d, cfg.n_layers, cfg.self_loop, cfg.skip_connect),
    }
    cand_raw, bn_cand_raw = HLayers.init_cand_cell(jax.random.fold_in(ks[17], 0), d, cfg.n_layers)
    cand_inv, bn_cand_inv = HLayers.init_cand_cell(jax.random.fold_in(ks[17], 1), d, cfg.n_layers)
    params["cand_raw"] = cand_raw
    params["cand_inv"] = cand_inv

    dec_keys = jax.random.split(ks[18], 4)
    p_ob_raw, bn_ob_raw = D.init_convtrans(dec_keys[0], d)
    p_ob_inv, bn_ob_inv = D.init_convtrans(dec_keys[1], d)
    p_rel_raw, bn_rel_raw = D.init_convtrans(dec_keys[2], d)
    p_rel_his, bn_rel_his = D.init_convtrans(dec_keys[3], d)
    params.update(decoder_ob_raw=p_ob_raw, decoder_ob_inv=p_ob_inv,
                  decoder_rel_raw=p_rel_raw, decoder_rel_his=p_rel_his)

    if cfg.use_static:
        params["words_emb"] = xavier_normal(ks[19], (cfg.num_words, d))
        params["static_rgcn"] = init_rgcn_block_layer(
            jax.random.fold_in(ks[19], 1), d, cfg.num_static_rels * 2, cfg.n_bases
        )

    state = HisResState(
        bn_ob_raw=bn_ob_raw, bn_ob_inv=bn_ob_inv,
        bn_rel_raw=bn_rel_raw, bn_rel_his=bn_rel_his,
        bn_cand_raw=bn_cand_raw, bn_cand_inv=bn_cand_inv,
    )
    return params, state


def _stream(params, cfg, history, h_init, prefix: str, time_encode: bool,
            rng, train):
    """One recurrent stream (ref :272-313). Returns (h_final, h0_final)."""
    emb_rel = params["emb_rel"]
    R2 = cfg.num_rels_total
    rel_cell = params[f"relation_cell_{1 if prefix == 'g' else 2}"]
    ent_cell = params[f"entity_cell_{1 if prefix == 'g' else 2}"]
    rgcn = params["rgcn" if prefix == "g" else "rgcn_2"]
    T = history.src.shape[0]

    def step(carry, inputs):
        h, h0, started = carry
        step_idx, snap = inputs
        k = jax.random.fold_in(rng, step_idx) if rng is not None else None
        if time_encode:
            # LogCL cosine time encoding (ref :274-277); t2 = T - i + 1
            t2 = (T - step_idx + 1).astype(jnp.float32)
            # cos computed fp32, result back in the compute dtype
            h_t = jnp.cos(params["weight_t2"].astype(jnp.float32) * t2
                          + params["bias_t2"].astype(jnp.float32)).astype(h.dtype)
            h_t = jnp.broadcast_to(h_t, h.shape)
            h = jnp.concatenate([h, h_t], axis=1) @ params["time_linear_w"].T + params["time_linear_b"]

        ctx = masked_segment_mean(h[snap.rc_ent], snap.rc_rel, snap.rc_mask, R2)
        # first step initialises h0 from r_linear (ref :285-287)
        h0_init = jnp.concatenate([emb_rel, ctx], axis=1) @ params["r_linear_w"].T + params["r_linear_b"]
        if cfg.layer_norm:
            h0_init = l2_normalize(h0_init)
        h0 = jnp.where(started > 0, h0, h0_init)

        cur_h, cur_r = HLayers.hisres_rgcn_cell(
            rgcn, h, h0, snap, dropout=cfg.dropout, rng=k, train=train,
            impl=cfg.impl,
        )
        h_new = gru_cell(ent_cell, cur_h, h)
        if cfg.layer_norm:
            h_new = l2_normalize(h_new)
        r_input = jnp.concatenate([cur_r, ctx], axis=1)
        h0_new = gru_cell(rel_cell, r_input, h0)
        if cfg.layer_norm:
            h0_new = l2_normalize(h0_new)
        return (h_new, h0_new, jnp.ones(())), h_new

    # short history axis fully unrolled — cross-step fusion (op-count-bound)
    (h_final, h0_final, _), all_h = jax.lax.scan(
        step, (h_init, emb_rel, jnp.zeros(())), (jnp.arange(T), history),
        unroll=True
    )
    return h_final, h0_final, all_h


def forward(
    params: Params,
    cfg: HisResConfig,
    history,  # per-snapshot stream [T, ...]
    history_gg,  # union-graph stream [T', ...]
    *,
    static_snap=None,
    rng=None,
    train: bool = False,
):
    """Both streams -> (g_emb, gg_emb, r_emb, static_emb, all_h)."""
    k1 = k2 = k3 = None
    if rng is not None:
        k1, k2, k3 = jax.random.split(rng, 3)
    if cfg.use_static and static_snap is not None:
        h_all = jnp.concatenate([params["dynamic_emb"], params["words_emb"]], axis=0)
        out = rgcn_block_layer(params["static_rgcn"], h_all, static_snap, cfg.n_bases,
                               rng=k3, dropout=cfg.dropout, train=train)
        static_emb = out[: cfg.num_ents]
        if cfg.layer_norm:
            static_emb = l2_normalize(static_emb)
        h_init = static_emb
    else:
        h_init = l2_normalize(params["dynamic_emb"]) if cfg.layer_norm else params["dynamic_emb"]
        static_emb = h_init

    g_emb, r_emb, all_h = _stream(params, cfg, history, h_init, "g", True, k1, train)
    gg_emb, _, _ = _stream(params, cfg, history_gg, h_init, "gg", False, k2, train)
    return g_emb, gg_emb, r_emb, static_emb, all_h


def fuse_streams(params, g_emb, gg_emb):
    """weight_g = sigmoid(linear_g(g_emb)) blend (ref :331-333)."""
    w = jax.nn.sigmoid(g_emb @ params["linear_g_w"].T + params["linear_g_b"])
    return w * g_emb + (1 - w) * gg_emb


def _time_convtrans_score(dec_params, bn_state, embedding, rel_emb, triples, mask,
                          cfg, rng, train, mode: str, partial=None):
    """TimeConvTransE/R pipelines (ref:hisres_src/decoder.py)."""
    ent_all = jnp.tanh(embedding)
    e1 = ent_all[triples[:, 0]]
    if mode == "entity":
        other = rel_emb[triples[:, 1]]
    else:
        other = ent_all[triples[:, 2]]
    stacked = jnp.stack([e1, other], axis=1)
    x, new_bn = D._convtrans_features(
        dec_params, bn_state, stacked, mask,
        input_dropout=cfg.input_dropout, hidden_dropout=cfg.hidden_dropout,
        feat_dropout=cfg.feat_dropout, rng=rng, train=train,
    )
    cand = ent_all if mode == "entity" else rel_emb
    scores = jnp.dot(x, cand.T, preferred_element_type=jnp.float32)
    if partial is not None:
        scores = scores * partial  # one-hot history mask (ref decoder :48-51)
    return scores, new_bn


def _masked_ce(scores, labels, mask):
    logz = jax.nn.logsumexp(scores, axis=1)
    ll = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    return jnp.sum((logz - ll) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def get_loss(
    params: Params,
    state: HisResState,
    cfg: HisResConfig,
    history,
    history_gg,
    triples: jax.Array,  # [B, 3] raw (no inverses), padded
    inv_triples: jax.Array,  # [B, 3] inverse rows
    mask: jax.Array,
    his_graph_raw,  # Snapshot (query-conditioned history graph)
    his_graph_inv,
    rel_vocab: jax.Array,  # [2B, 2R] one-hot
    *,
    static_snap=None,
    rng=None,
    train: bool = True,
):
    ks = jax.random.split(rng, 6) if rng is not None else [None] * 6
    g_emb, gg_emb, r_emb, static_emb, all_h = forward(
        params, cfg, history, history_gg, static_snap=static_snap,
        rng=ks[0], train=train,
    )
    pre_emb = fuse_streams(params, g_emb, gg_emb)

    emb_raw, bn_cand_raw = HLayers.cand_cell(
        params["cand_raw"], state.bn_cand_raw, pre_emb, r_emb, his_graph_raw,
        dropout=cfg.cand_dropout, rng=ks[1], train=train)
    emb_raw = l2_normalize(emb_raw)
    emb_inv, bn_cand_inv = HLayers.cand_cell(
        params["cand_inv"], state.bn_cand_inv, pre_emb, r_emb, his_graph_inv,
        dropout=cfg.cand_dropout, rng=ks[2], train=train)
    emb_inv = l2_normalize(emb_inv)

    w_s = jax.nn.sigmoid(emb_raw @ params["linear_s1_w"].T + params["linear_s1_b"])
    w_o = jax.nn.sigmoid(emb_inv @ params["linear_o1_w"].T + params["linear_o1_b"])
    final_raw = w_s * emb_raw + (1 - w_s) * pre_emb
    final_inv = w_o * emb_inv + (1 - w_o) * pre_emb

    zero = jnp.zeros(())
    loss_ent = loss_rel = loss_static = zero
    new_state = dict(bn_ob_raw=state.bn_ob_raw, bn_ob_inv=state.bn_ob_inv,
                     bn_rel_raw=state.bn_rel_raw, bn_rel_his=state.bn_rel_his,
                     bn_cand_raw=bn_cand_raw, bn_cand_inv=bn_cand_inv)

    if cfg.entity_prediction:
        preds, new_state["bn_ob_raw"] = _time_convtrans_score(
            params["decoder_ob_raw"], state.bn_ob_raw, final_raw, r_emb,
            triples, mask, cfg, ks[3], train, "entity")
        predo, new_state["bn_ob_inv"] = _time_convtrans_score(
            params["decoder_ob_inv"], state.bn_ob_inv, final_inv, r_emb,
            inv_triples, mask, cfg, ks[4], train, "entity")
        loss_ent = 0.5 * _masked_ce(preds, triples[:, 2], mask) + \
            0.5 * _masked_ce(predo, inv_triples[:, 2], mask)

    if cfg.relation_prediction:
        all_triples = jnp.concatenate([triples, inv_triples])
        all_mask = jnp.concatenate([mask, mask])
        s_raw, new_state["bn_rel_raw"] = _time_convtrans_score(
            params["decoder_rel_raw"], state.bn_rel_raw, pre_emb, r_emb,
            all_triples, all_mask, cfg, ks[5], train, "relation")
        s_his, new_state["bn_rel_his"] = _time_convtrans_score(
            params["decoder_rel_his"], state.bn_rel_his, pre_emb, r_emb,
            all_triples, all_mask, cfg,
            jax.random.fold_in(ks[5], 1) if ks[5] is not None else None,
            train, "relation", partial=rel_vocab)
        score = cfg.history_rate * s_his + (1 - cfg.history_rate) * s_raw
        loss_rel = _masked_ce(score, all_triples[:, 1], all_mask)

    if cfg.use_static and static_emb is not None:
        T = all_h.shape[0]
        steps = jnp.arange(1, T + 1, dtype=jnp.float32)
        if cfg.discount == 0:
            steps = jnp.ones_like(steps)
        angles = jnp.cos(cfg.angle * jnp.pi / 180.0 * steps)
        evo = l2_normalize(all_h, axis=-1) if cfg.layer_norm else all_h
        if cfg.layer_norm:
            sim = jnp.sum(static_emb[None] * evo, axis=-1)
        else:
            num = jnp.sum(static_emb[None] * all_h, axis=-1)
            den = (jnp.linalg.norm(static_emb, axis=-1)[None]
                   * jnp.linalg.norm(all_h, axis=-1))
            sim = num / jnp.maximum(den, 1e-12)
        gap = angles[:, None] - sim
        loss_static = cfg.static_weight * jnp.sum(jnp.where(gap > 0, gap, 0.0))

    losses = {"entity": loss_ent, "relation": loss_rel, "static": loss_static}
    return loss_ent, losses, HisResState(**new_state)


def predict(
    params: Params,
    state: HisResState,
    cfg: HisResConfig,
    history,
    history_gg,
    triples: jax.Array,
    inv_triples: jax.Array,
    mask: jax.Array,
    his_graph_raw,
    his_graph_inv,
    rel_vocab: jax.Array,
    *,
    static_snap=None,
):
    """Eval scores (ref :394-434): entity scores stacked [raw; inv] to
    match all_triples = [triples; inverse]."""
    g_emb, gg_emb, r_emb, _, _ = forward(
        params, cfg, history, history_gg, static_snap=static_snap, train=False,
    )
    pre_emb = fuse_streams(params, g_emb, gg_emb)
    emb_raw, _ = HLayers.cand_cell(params["cand_raw"], state.bn_cand_raw,
                                   pre_emb, r_emb, his_graph_raw, train=False)
    emb_raw = l2_normalize(emb_raw)
    emb_inv, _ = HLayers.cand_cell(params["cand_inv"], state.bn_cand_inv,
                                   pre_emb, r_emb, his_graph_inv, train=False)
    emb_inv = l2_normalize(emb_inv)
    w_s = jax.nn.sigmoid(emb_raw @ params["linear_s1_w"].T + params["linear_s1_b"])
    w_o = jax.nn.sigmoid(emb_inv @ params["linear_o1_w"].T + params["linear_o1_b"])
    final_raw = w_s * emb_raw + (1 - w_s) * pre_emb
    final_inv = w_o * emb_inv + (1 - w_o) * pre_emb

    preds, _ = _time_convtrans_score(params["decoder_ob_raw"], state.bn_ob_raw,
                                     final_raw, r_emb, triples, mask, cfg, None,
                                     False, "entity")
    predo, _ = _time_convtrans_score(params["decoder_ob_inv"], state.bn_ob_inv,
                                     final_inv, r_emb, inv_triples, mask, cfg,
                                     None, False, "entity")
    scores_ent = jnp.concatenate([preds, predo], axis=0)

    all_triples = jnp.concatenate([triples, inv_triples])
    all_mask = jnp.concatenate([mask, mask])
    s_raw, _ = _time_convtrans_score(params["decoder_rel_raw"], state.bn_rel_raw,
                                     pre_emb, r_emb, all_triples, all_mask, cfg,
                                     None, False, "relation")
    s_his, _ = _time_convtrans_score(params["decoder_rel_his"], state.bn_rel_his,
                                     pre_emb, r_emb, all_triples, all_mask, cfg,
                                     None, False, "relation", partial=rel_vocab)
    scores_rel = cfg.history_rate * s_his + (1 - cfg.history_rate) * s_raw
    return scores_ent, scores_rel
