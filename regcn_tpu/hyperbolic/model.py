"""HyperbolicRecurrentRGCN — the hyperbolic model core.

Parity with ref:hyperbolic_src/hyperbolic_model.py:157-1128, re-designed
as a pure function scanned over the stacked history window (same design
as :mod:`regcn_tpu.models.recurrent`):

Evolution step (one snapshot, ref :797-884):
  ctx     = segment-mean of log_0(h) over relation incidence
  h0      = GRUCell([emb_rel ; ctx], h0)              (tangent space)
  cur     = HyperbolicEncoderCell(g, h, h0)           (one of 4 encoders)
  cur     = tangent-normalised (layer_norm)
  h       = exp_0( gate * log_0(cur) + (1-gate) * log_0(h) )  (±10 clamps)
  h       = TemporalRadiusEvolution(h, static_radius)  or apply_radius

Curvature: fixed, or learnable as clamp(exp(log_c), c_min, c_max)
(ref :296-304, :673-679) — a traced scalar, so the same compiled program
serves every curvature value during warmup scheduling.

Notes on conscious divergences:
- the reference defines w1/w2 parameters that are never used in any
  forward path (ref :341-345, same in ref:src/rrgcn.py:89-93); omitted.
- `radius_target` is a non-trainable buffer; it lives in the model state
  pytree (not params) so weight decay cannot touch it.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regcn_tpu.hyperbolic import decoders as HD
from regcn_tpu.hyperbolic import layers as HL
from regcn_tpu.hyperbolic import ops as H
from regcn_tpu.models.layers import gru_cell, init_gru_cell, init_rgcn_block_layer, rgcn_block_layer
from regcn_tpu.ops.activations import l2_normalize
from regcn_tpu.ops.remat import remat_scan_step
from regcn_tpu.ops.segment import masked_segment_mean
from regcn_tpu.utils.init import xavier_normal, xavier_uniform

Params = Dict[str, Any]

CLAMP = 10.0

ENCODERS = HL.ENCODERS
DECODERS = ("hyperbolic_convtranse", "murp", "roth", "atth")


@dataclasses.dataclass(frozen=True)
class HyperbolicConfig:
    num_ents: int
    num_rels: int
    h_dim: int = 200
    n_layers: int = 2
    encoder: str = "hyperbolic_uvrgcn"
    decoder: str = "hyperbolic_convtranse"
    dropout: float = 0.2
    input_dropout: float = 0.2
    hidden_dropout: float = 0.2
    feat_dropout: float = 0.2
    self_loop: bool = True
    skip_connect: bool = False
    layer_norm: bool = True
    entity_prediction: bool = True
    relation_prediction: bool = True
    # static graph
    use_static: bool = False
    num_static_rels: int = 0
    num_words: int = 0
    n_bases: int = 100
    static_weight: float = 0.5
    discount: float = 1.0
    angle: float = 10.0
    # curvature (ref :296-304)
    c: float = 0.01
    learn_curvature: bool = False
    curvature_min: float = 1e-4
    curvature_max: float = 1e-1
    # store entities ON the ball + Riemannian Adam (geoopt path, ref :319-325)
    manifold_entities: bool = False
    # radius machinery (ref :335-338, :526-531)
    use_residual_evolution: bool = True
    radius_lambda: float = 0.02
    radius_min: float = 0.5
    radius_max: float = 3.0
    radius_epsilon: float = 0.1
    radius_anchor_beta: float = 1.0
    radius_msg_gamma: float = 1.0
    # bfloat16 activations/weights on the compute path; parameters,
    # optimizer state, norm/transcendental islands, BN statistics and CE
    # reductions stay fp32 (new TPU capability — the reference is
    # fp32-only). Validated for the flagship uvrgcn+convtranse path.
    compute_dtype: str = "float32"
    # encoder/decoder extras
    num_heads: int = 4
    hyp_init_scale: float = 1e-3
    hyp_score_scale_init: float = 1.0
    hyp_score_margin_init: float = 1.0
    use_entity_bias: bool = False
    use_rel_curvature: bool = False
    # radius-target computation weights (ref:hyperbolic_main.py:729-730)
    radius_alpha: float = 0.5
    radius_beta: float = 0.5
    # EST (wired in regcn_tpu.hyperbolic.est)
    use_est: bool = False
    est_state_alpha: float = 0.2
    est_encoder: str = "gru"
    est_history_len: int = 32
    use_time_aware_negative: bool = False
    # scatter backend for the uvrgcn aggregation: "xla" segment_sum or the
    # Pallas MXU one-hot kernel (ops/pallas_rgcn.py)
    impl: str = "xla"

    @property
    def num_rels_total(self) -> int:
        return 2 * self.num_rels


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HypModelState:
    """Non-parameter state: decoder BN stats + the radius-target buffer."""

    bn_ob: Any
    bn_rel: Any
    radius_target: jax.Array  # [N]


def init_params(
    rng: jax.Array, cfg: HyperbolicConfig, radius_target=None
) -> Tuple[Params, HypModelState]:
    ks = jax.random.split(rng, 12)
    if cfg.manifold_entities:
        # on-ball init: tangent normal std 0.1 then exp map (ref :322-325)
        dyn = H.exp_map_zero(
            0.1 * jax.random.normal(ks[0], (cfg.num_ents, cfg.h_dim)), cfg.c
        )
    else:
        # tangent-space init (non-geoopt fallback path, ref :326-328)
        dyn = jax.random.normal(ks[0], (cfg.num_ents, cfg.h_dim))
    params: Params = {
        "dynamic_emb": dyn,
        "emb_rel": xavier_normal(ks[1], (cfg.num_rels_total, cfg.h_dim)),
        "time_gate_w": xavier_uniform(ks[2], (cfg.h_dim, cfg.h_dim), gain=math.sqrt(2.0)),
        "time_gate_b": jnp.zeros((cfg.h_dim,)),
        "gru": init_gru_cell(ks[3], 2 * cfg.h_dim, cfg.h_dim),
        "rgcn": HL.init_encoder_cell(
            ks[4], cfg.encoder, cfg.h_dim, cfg.num_rels_total, cfg.n_layers,
            n_bases=cfg.n_bases, num_heads=cfg.num_heads,
            self_loop=cfg.self_loop, skip_connect=cfg.skip_connect,
        ),
        # TemporalRadiusEvolution MLP (ref:hyperbolic_ops.py:390-392)
        "radius_mlp_w": xavier_uniform(ks[5], (1, cfg.h_dim), gain=0.1),
        "radius_mlp_b": jnp.zeros((1,)),
    }
    if cfg.learn_curvature:
        params["log_c"] = jnp.asarray(math.log(cfg.c), jnp.float32)

    rt = (
        jnp.asarray(radius_target)
        if radius_target is not None
        else jnp.full((cfg.num_ents,), 0.5 * (cfg.radius_min + cfg.radius_max),
                      jnp.float32)
    )
    # learnable copy of the target (ref :531) — explicit copy so the param
    # and the state buffer never alias (donation would otherwise double-free)
    params["radius_static"] = jnp.array(rt, copy=True)

    bn_ob = bn_rel = {}
    if cfg.decoder == "hyperbolic_convtranse":
        params["decoder_ob"], bn_ob = HD.init_hyperbolic_convtranse(
            ks[6], cfg.num_ents, cfg.h_dim
        )
        params["decoder_rel"], bn_rel = HD.init_hyperbolic_convtransr(
            ks[7], cfg.num_rels_total, cfg.h_dim
        )
    elif cfg.decoder == "murp":
        params["decoder_ob"] = HD.init_murp(
            ks[6], cfg.num_ents, cfg.num_rels_total, cfg.h_dim, cfg.c,
            cfg.hyp_init_scale, cfg.use_entity_bias, cfg.use_rel_curvature,
            score_scale_init=cfg.hyp_score_scale_init,
            score_margin_init=cfg.hyp_score_margin_init,
        )
        params["decoder_rel"] = HD.init_murp_rel(ks[7], cfg.num_rels, cfg.h_dim)
    elif cfg.decoder == "roth":
        params["decoder_ob"] = HD.init_roth(
            ks[6], cfg.num_ents, cfg.num_rels_total, cfg.h_dim, cfg.c,
            cfg.hyp_init_scale, cfg.use_entity_bias, cfg.use_rel_curvature,
            score_scale_init=cfg.hyp_score_scale_init,
            score_margin_init=cfg.hyp_score_margin_init,
        )
        params["decoder_rel"] = HD.init_roth_rel(
            ks[7], cfg.num_rels, cfg.h_dim, cfg.hyp_init_scale,
            score_scale_init=cfg.hyp_score_scale_init,
            score_margin_init=cfg.hyp_score_margin_init,
        )
    elif cfg.decoder == "atth":
        params["decoder_ob"] = HD.init_atth(
            ks[6], cfg.num_ents, cfg.num_rels_total, cfg.h_dim, cfg.c,
            cfg.hyp_init_scale, cfg.use_entity_bias, cfg.use_rel_curvature,
            score_scale_init=cfg.hyp_score_scale_init,
            score_margin_init=cfg.hyp_score_margin_init,
        )
        params["decoder_rel"] = HD.init_atth_rel(
            ks[7], cfg.num_rels, cfg.h_dim, cfg.hyp_init_scale,
            score_scale_init=cfg.hyp_score_scale_init,
            score_margin_init=cfg.hyp_score_margin_init,
        )
    else:
        raise ValueError(f"unknown decoder {cfg.decoder!r}; known: {DECODERS}")

    if cfg.use_static:
        params["words_emb"] = xavier_normal(ks[8], (cfg.num_words, cfg.h_dim))
        params["static_rgcn"] = init_rgcn_block_layer(
            ks[9], cfg.h_dim, cfg.num_static_rels * 2, cfg.n_bases
        )
    if cfg.use_est:
        from regcn_tpu.hyperbolic import est

        params["est"] = est.init_est_params(ks[10], cfg)

    state = HypModelState(bn_ob=bn_ob, bn_rel=bn_rel, radius_target=rt)
    return params, state


def get_curvature(params: Params, cfg: HyperbolicConfig, curvature_max=None):
    """clamp(exp(log_c), cmin, cmax) when learnable (ref :673-679).

    ``curvature_max`` may be a traced scalar (warmup schedule,
    ref:hyperbolic_main.py:528-545) so the schedule does not recompile.
    """
    if cfg.learn_curvature:
        cmax = cfg.curvature_max if curvature_max is None else curvature_max
        return jnp.clip(jnp.exp(params["log_c"]), cfg.curvature_min, cmax)
    return jnp.asarray(cfg.c)


def _static_radius(params: Params, cfg: HyperbolicConfig, c):
    """clip(radius_static, rmin, rmax) then below the ball boundary
    (ref :715-720; the curvature bound uses a detached c)."""
    r = jnp.clip(params["radius_static"], cfg.radius_min, cfg.radius_max)
    max_r = 1.0 / jnp.sqrt(jax.lax.stop_gradient(c))
    # dtype-preserving: with learn_curvature, max_r is a STRONG f32
    # scalar and jnp.minimum would silently promote a bf16 radius buffer
    # (and through apply_radius the whole evolution carry) to f32
    return jnp.minimum(r, max_r - 1e-6).astype(r.dtype)


def _radius_evolution(params, cfg, x, static_radius, c):
    """TemporalRadiusEvolution (ref:hyperbolic_ops.py:364-435)."""
    tangent = H.log_map_zero(x, c)
    delta = (tangent @ params["radius_mlp_w"].T + params["radius_mlp_b"])[..., 0]
    delta = jnp.clip(delta, -cfg.radius_epsilon, cfg.radius_epsilon)
    dynamic_radius = H.get_radius(x)
    base = cfg.radius_anchor_beta * static_radius + (1.0 - cfg.radius_anchor_beta) * dynamic_radius
    return H.apply_radius(x, base + delta, c)


def evolve(
    params: Params,
    cfg: HyperbolicConfig,
    history,  # SnapshotBatch pytree [T, ...]
    *,
    static_snap=None,
    est_slow_state: Optional[jax.Array] = None,  # H-PES injection (ref :787-788)
    rng=None,
    train: bool = False,
    return_all: bool = False,
    curvature_max=None,
    tangent_fast: Optional[bool] = None,
):
    """Returns (h_final ball, h0_final tangent, static_emb, all_h?).

    tangent_fast=None auto-selects the tangent-carry scan for the
    ``hyperbolic_uvrgcn`` encoder (mathematically identical, ~half the
    full-table transcendental passes per step); False forces the
    ball-space reference path (used by the equivalence test).
    """
    c = get_curvature(params, cfg, curvature_max)

    if cfg.use_static and static_snap is not None:
        h_all = jnp.concatenate([params["dynamic_emb"], params["words_emb"]], axis=0)
        k_st = jax.random.fold_in(rng, 997) if rng is not None else None
        out = rgcn_block_layer(
            params["static_rgcn"], h_all, static_snap, cfg.n_bases,
            rng=k_st, dropout=cfg.dropout, train=train,
        )
        static_emb = out[: cfg.num_ents]
        if cfg.layer_norm:
            static_emb = l2_normalize(static_emb)
        h = H.exp_map_zero(static_emb, c)
    elif cfg.manifold_entities:
        # entities already live on the ball: project only (ref :775-777)
        h = H.project_to_ball(params["dynamic_emb"], c)
        static_emb = None
    else:
        init_emb = l2_normalize(params["dynamic_emb"]) if cfg.layer_norm else params["dynamic_emb"]
        h = H.exp_map_zero(init_emb, c)
        static_emb = None
    h = H.apply_radius(h, _static_radius(params, cfg, c), c)

    if cfg.use_est and est_slow_state is not None:
        from regcn_tpu.hyperbolic import est

        h = est.inject_slow_state(params["est"], h, est_slow_state, c)

    emb_rel = params["emb_rel"]
    R2 = cfg.num_rels_total
    static_radius = _static_radius(params, cfg, c)

    if tangent_fast is None:
        tangent_fast = cfg.encoder == "hyperbolic_uvrgcn"
    if tangent_fast and cfg.encoder == "hyperbolic_uvrgcn":
        return _evolve_tangent(
            params, cfg, history, h, emb_rel, static_emb, static_radius, c,
            rng=rng, train=train, return_all=return_all,
        )

    def step(carry, inputs):
        h, h0 = carry
        step_idx, snap = inputs
        k = jax.random.fold_in(rng, step_idx) if rng is not None else None
        h_tan = H.log_map_zero(h, c)
        ctx = masked_segment_mean(h_tan[snap.rc_ent], snap.rc_rel, snap.rc_mask, R2)
        x_input = jnp.concatenate([emb_rel, ctx], axis=1)
        h0_new = gru_cell(params["gru"], x_input, h0)
        if cfg.layer_norm:
            h0_new = l2_normalize(h0_new)

        cur = HL.encoder_cell(
            params["rgcn"], cfg.encoder, h, h0_new, snap, c,
            n_bases=cfg.n_bases, num_heads=cfg.num_heads,
            radius_gamma=cfg.radius_msg_gamma, dropout=cfg.dropout,
            rng=k, train=train, impl=cfg.impl,
        )
        cur = H.project_to_ball(cur, c)
        if cfg.layer_norm:
            cur = H.exp_map_zero(l2_normalize(H.log_map_zero(cur, c)), c)

        cur_tan = jnp.clip(H.log_map_zero(cur, c), -CLAMP, CLAMP)
        prev_tan = jnp.clip(H.log_map_zero(h, c), -CLAMP, CLAMP)
        gate = jax.nn.sigmoid(prev_tan @ params["time_gate_w"] + params["time_gate_b"])
        h_new = H.exp_map_zero(gate * cur_tan + (1.0 - gate) * prev_tan, c)
        h_new = H.project_to_ball(h_new, c)

        if cfg.use_residual_evolution:
            h_new = _radius_evolution(params, cfg, h_new, static_radius, c)
        else:
            h_new = H.apply_radius(h_new, static_radius, c)
        # empty (all-masked) snapshots are identity steps — lets fused
        # epochs front-pad short windows (see models/recurrent.py)
        active = jnp.max(snap.edge_mask) > 0
        h_new = jnp.where(active, h_new, h)
        h0_new = jnp.where(active, h0_new, h0)
        return (h_new, h0_new), (h_new if return_all else 0.0)

    T = history.src.shape[0]
    # unroll the short history axis (T = history_len, typically 3):
    # inlining the bodies lets XLA fuse across steps — measured -12%
    # epoch time on the headline config (the step is op-count-bound)
    (h_final, h0_final), ys = jax.lax.scan(
        remat_scan_step(step), (h, emb_rel), (jnp.arange(T), history),
        unroll=True)
    return h_final, h0_final, static_emb, (ys if return_all else None)


def _evolve_tangent(
    params, cfg, history, h_init, emb_rel, static_emb, static_radius, c,
    *, rng=None, train=False, return_all=False,
):
    """Tangent-carry scan for the uvrgcn encoder.

    The ball-space step (``evolve``) runs ~12 full-entity-table
    transcendental map passes per snapshot, almost all of them paired
    exp_0/log_0 inverses. Here the carry IS the tangent representation
    (invariant: v = log_0(h) exactly, including eps clamps — see
    ops.clamp_tangent_norm), so each step needs only O(1) cheap [N]-norm
    transcendentals and exp-maps happen once, outside the scan.
    Equivalence with the ball path is tested (tests/test_hyperbolic_model.py).
    """
    R2 = cfg.num_rels_total
    v0 = H.log_map_zero(h_init, c)

    def step(carry, inputs):
        v, h0 = carry
        step_idx, snap = inputs
        k = jax.random.fold_in(rng, step_idx) if rng is not None else None

        ctx = masked_segment_mean(v[snap.rc_ent], snap.rc_rel, snap.rc_mask, R2)
        x_input = jnp.concatenate([emb_rel, ctx], axis=1)
        h0_new = gru_cell(params["gru"], x_input, h0)
        if cfg.layer_norm:
            h0_new = l2_normalize(h0_new)

        cur = HL.uvrgcn_cell_tangent(
            params["rgcn"], v, h0_new, snap, c,
            radius_gamma=cfg.radius_msg_gamma, dropout=cfg.dropout,
            rng=k, train=train, impl=cfg.impl,
        )
        # ball path: project (folded into the cell's final clamp) then
        # tangent layer-norm then clip; unit rows make the clip a no-op
        if cfg.layer_norm:
            cur_tan = l2_normalize(cur)
        else:
            cur_tan = jnp.clip(cur, -CLAMP, CLAMP)
        prev_tan = jnp.clip(v, -CLAMP, CLAMP)
        gate = jax.nn.sigmoid(prev_tan @ params["time_gate_w"] + params["time_gate_b"])
        v_new = H.clamp_tangent_norm(gate * cur_tan + (1.0 - gate) * prev_tan, c)

        if cfg.use_residual_evolution:
            delta = (v_new @ params["radius_mlp_w"].T + params["radius_mlp_b"])[..., 0]
            delta = jnp.clip(delta, -cfg.radius_epsilon, cfg.radius_epsilon)
            dynamic_radius = H.radius_from_tangent(v_new, c)
            base = (cfg.radius_anchor_beta * static_radius
                    + (1.0 - cfg.radius_anchor_beta) * dynamic_radius)
            v_new = H.apply_radius_tangent(v_new, base + delta, c)
        else:
            v_new = H.apply_radius_tangent(v_new, static_radius, c)
        active = jnp.max(snap.edge_mask) > 0
        v_new = jnp.where(active, v_new, v)
        h0_new = jnp.where(active, h0_new, h0)
        return (v_new, h0_new), (v_new if return_all else 0.0)

    T = history.src.shape[0]
    # unrolled over the short history axis (see _evolve): -12% epoch time
    (v_final, h0_final), ys = jax.lax.scan(
        remat_scan_step(step), (v0, emb_rel), (jnp.arange(T), history),
        unroll=True)
    h_final = H.exp_map_zero(v_final, c)
    all_h = H.exp_map_zero(ys, c) if return_all else None
    return h_final, h0_final, static_emb, all_h


def _final_embedding(h, cfg, c):
    if cfg.layer_norm:
        return H.exp_map_zero(l2_normalize(H.log_map_zero(h, c)), c)
    return h


def _decoder_dropouts(cfg):
    return (cfg.input_dropout, cfg.hidden_dropout, cfg.feat_dropout)


def _masked_ce(scores, labels, mask):
    scores = scores.astype(jnp.float32)  # CE always reduces in fp32
    logz = jax.nn.logsumexp(scores, axis=1)
    ll = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    nll = (logz - ll) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)


def entity_scores(params, state, cfg, pre_emb, r_emb, triples, mask, c,
                  *, rng=None, train=False, ent_tan=None):
    if cfg.decoder == "hyperbolic_convtranse":
        scores, new_bn = HD.hyperbolic_convtranse_score(
            params["decoder_ob"], state.bn_ob, pre_emb, r_emb, triples, c,
            mask=mask, dropouts=_decoder_dropouts(cfg), rng=rng, train=train,
            ent_tan=ent_tan,
        )
        return scores, new_bn
    fn = {"murp": HD.murp_score, "roth": HD.roth_score, "atth": HD.atth_score}[cfg.decoder]
    scores = fn(params["decoder_ob"], pre_emb, r_emb, triples, c,
                dropout=cfg.input_dropout, rng=rng, train=train)
    return scores, state.bn_ob


def relation_scores(params, state, cfg, pre_emb, r_emb, triples, mask, c,
                    *, rng=None, train=False, ent_tan=None):
    if cfg.decoder == "hyperbolic_convtranse":
        scores, new_bn = HD.hyperbolic_convtransr_score(
            params["decoder_rel"], state.bn_rel, pre_emb, r_emb, triples, c,
            mask=mask, dropouts=_decoder_dropouts(cfg), rng=rng, train=train,
            ent_tan=ent_tan,
        )
        return scores, new_bn
    fn = {"murp": HD.murp_rel_score, "roth": HD.roth_rel_score,
          "atth": HD.atth_rel_score}[cfg.decoder]
    scores = fn(params["decoder_rel"], pre_emb, r_emb, triples, c,
                dropout=cfg.input_dropout, rng=rng, train=train)
    return scores, state.bn_rel


def static_angular_loss_tangent(static_emb, all_h, cfg, c, active=None):
    """Static constraint compared in tangent space (ref :1039-1064).

    ``active`` ([T] {0,1}): real-history-step mask for front-padded
    windows (see models/recurrent.py:static_angular_loss)."""
    T = all_h.shape[0]
    if active is None:
        steps = jnp.arange(1, T + 1, dtype=jnp.float32)
    else:
        active = active.astype(jnp.float32)
        steps = jnp.cumsum(active)
    if cfg.discount == 0:
        steps = jnp.ones_like(steps)
    angles = jnp.cos(cfg.angle * jnp.pi / 180.0 * steps)
    evo_tan = H.log_map_zero(all_h, c)
    if cfg.layer_norm:
        sim = jnp.sum(static_emb[None] * l2_normalize(evo_tan, axis=-1), axis=-1)
    else:
        num = jnp.sum(static_emb[None] * evo_tan, axis=-1)
        den = jnp.linalg.norm(static_emb, axis=-1)[None] * jnp.linalg.norm(evo_tan, axis=-1)
        sim = num / jnp.maximum(den, 1e-12)
    gap = angles[:, None] - sim
    gap = jnp.where(gap > 0, gap, 0.0)
    if active is not None:
        gap = gap * active[:, None]
    return cfg.static_weight * jnp.sum(gap)


def radius_supervision_loss(params, state, cfg, triples, mask, c):
    """MSE(radius_static, radius_target) over the batch's unique entities
    (ref :1066-1073), vectorised via a per-entity presence indicator."""
    n = cfg.num_ents
    ents = jnp.concatenate([triples[:, 0], triples[:, 2]])
    w = jnp.concatenate([mask, mask])
    present = jnp.clip(
        jax.ops.segment_sum(w, ents, num_segments=n), 0.0, 1.0
    )
    rs = _static_radius(params, cfg, c)
    diff_sq = (rs - state.radius_target) ** 2 * present
    mse = jnp.sum(diff_sq) / jnp.maximum(jnp.sum(present), 1.0)
    return cfg.radius_lambda * mse


def get_loss(
    params: Params,
    state: HypModelState,
    cfg: HyperbolicConfig,
    history,
    triples: jax.Array,  # [B,3] with inverses, padded
    triple_mask: jax.Array,
    *,
    static_snap=None,
    est_inputs=None,  # (slow_state, retrieval batch) — see hyperbolic.est
    tans_mask_coo=None,  # optional (rows, cols) arrays for TANS filtering
    rng=None,
    train: bool = True,
    curvature_max=None,
) -> Tuple[jax.Array, Dict[str, jax.Array], HypModelState, Dict[str, jax.Array]]:
    """Entity + relation + static + radius losses (ref :941-1088).

    Returns (loss_ent, losses dict, new_state, aux) where aux carries the
    final embeddings for EST writeback.
    """
    c = get_curvature(params, cfg, curvature_max)
    k_fwd = k_ob = k_rel = k_est = None
    if rng is not None:
        k_fwd, k_ob, k_rel, k_est = jax.random.split(rng, 4)

    slow_state = est_inputs[0].slow if (cfg.use_est and est_inputs is not None) else None
    h, r_emb, static_emb, all_h = evolve(
        params, cfg, history, static_snap=static_snap,
        est_slow_state=slow_state, rng=k_fwd, train=train,
        return_all=cfg.use_static, curvature_max=curvature_max,
    )
    # _final_embedding unrolled so the tangent table can be shared with
    # both ConvTrans decoders (saves 2 full-table log maps per step)
    pre_tan = H.log_map_zero(h, c)
    if cfg.layer_norm:
        pre_tan = l2_normalize(pre_tan)
    pre_emb = H.exp_map_zero(pre_tan, c)
    ent_tan = HD._leaky_tanh(H.clamp_tangent_norm(pre_tan, c))

    if cfg.use_est and est_inputs is not None and est_inputs[1] is not None:
        from regcn_tpu.hyperbolic import est

        dyn_tan = (
            H.log_map_zero(params["dynamic_emb"], c)
            if cfg.manifold_entities else params["dynamic_emb"]
        )
        pre_emb, est_ctx_tan = est.enrich_embeddings(
            params["est"], cfg, pre_emb, triples, est_inputs[1], c,
            slow_state, dyn_tan, r_emb, rng=k_est, train=train,
            return_ctx_tangent=True,
        )
        ent_tan = None  # enrichment changed the table; decoders re-derive

    zero = jnp.zeros(())
    loss_ent = loss_rel = loss_static = zero
    new_bn_ob, new_bn_rel = state.bn_ob, state.bn_rel

    if cfg.entity_prediction:
        if cfg.decoder == "hyperbolic_convtranse":
            scores_ob, new_bn_ob = entity_scores(
                params, state, cfg, pre_emb, r_emb, triples, triple_mask, c,
                rng=k_ob, train=train, ent_tan=ent_tan,
            )
            if cfg.use_time_aware_negative and tans_mask_coo is not None and train:
                rows, cols = tans_mask_coo
                scores_ob = scores_ob.at[rows, cols].set(-1e9, mode="drop")
            loss_ent = _masked_ce(scores_ob, triples[:, 2], triple_mask)
        else:
            loss_fn = {"murp": HD.murp_loss, "roth": HD.roth_loss,
                       "atth": HD.atth_loss}[cfg.decoder]
            loss_ent = loss_fn(
                params["decoder_ob"], pre_emb, r_emb, triples, c,
                mask=triple_mask, dropout=cfg.input_dropout, rng=k_ob, train=train,
                rel_curvature_max=curvature_max,
            )

    if cfg.relation_prediction:
        if cfg.decoder == "hyperbolic_convtranse":
            scores_rel, new_bn_rel = relation_scores(
                params, state, cfg, pre_emb, r_emb, triples, triple_mask, c,
                rng=k_rel, train=train, ent_tan=ent_tan,
            )
            loss_rel = _masked_ce(scores_rel, triples[:, 1], triple_mask)
        else:
            loss_fn = {"murp": HD.murp_rel_loss, "roth": HD.roth_rel_loss,
                       "atth": HD.atth_rel_loss}[cfg.decoder]
            loss_rel = loss_fn(
                params["decoder_rel"], pre_emb, r_emb, triples, c,
                mask=triple_mask, dropout=cfg.input_dropout, rng=k_rel, train=train,
            )

    if cfg.use_static and static_emb is not None and all_h is not None:
        active = (jnp.max(history.edge_mask, axis=1) > 0).astype(jnp.float32)
        loss_static = static_angular_loss_tangent(static_emb, all_h, cfg, c,
                                                  active=active)

    loss_radius = radius_supervision_loss(params, state, cfg, triples, triple_mask, c)

    losses = {"entity": loss_ent, "relation": loss_rel,
              "static": loss_static, "radius": loss_radius}
    new_state = HypModelState(bn_ob=new_bn_ob, bn_rel=new_bn_rel,
                              radius_target=state.radius_target)
    aux = {"pre_emb": pre_emb, "curvature": c}
    if cfg.use_est and est_inputs is not None and est_inputs[1] is not None:
        # fused TANGENT rows for the H-PES writeback — saves the
        # [B, d] re-gather + log map of the enriched table per step
        aux["est_ctx_tan"] = est_ctx_tan
    return loss_ent, losses, new_state, aux


def predict(
    params: Params,
    state: HypModelState,
    cfg: HyperbolicConfig,
    history,
    triples: jax.Array,
    triple_mask: jax.Array,
    *,
    static_snap=None,
    est_inputs=None,
) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode scores (ref :892-939)."""
    c = get_curvature(params, cfg)
    slow_state = est_inputs[0].slow if (cfg.use_est and est_inputs is not None) else None
    h, r_emb, _, _ = evolve(
        params, cfg, history, static_snap=static_snap,
        est_slow_state=slow_state, rng=None, train=False,
    )
    pre_tan = H.log_map_zero(h, c)
    if cfg.layer_norm:
        pre_tan = l2_normalize(pre_tan)
    emb = H.exp_map_zero(pre_tan, c)
    ent_tan = HD._leaky_tanh(H.clamp_tangent_norm(pre_tan, c))
    if cfg.use_est and est_inputs is not None and est_inputs[1] is not None:
        from regcn_tpu.hyperbolic import est

        dyn_tan = (
            H.log_map_zero(params["dynamic_emb"], c)
            if cfg.manifold_entities else params["dynamic_emb"]
        )
        emb = est.enrich_embeddings(
            params["est"], cfg, emb, triples, est_inputs[1], c,
            slow_state, dyn_tan, r_emb,
        )
        ent_tan = None
    scores_ob, _ = entity_scores(params, state, cfg, emb, r_emb, triples,
                                 triple_mask, c, ent_tan=ent_tan)
    scores_rel, _ = relation_scores(params, state, cfg, emb, r_emb, triples,
                                    triple_mask, c, ent_tan=ent_tan)
    return scores_ob, scores_rel
