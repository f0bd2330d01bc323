"""Hyperbolic decoders: tangent ConvTransE/R, MuRP, RotH, AttH (+Rel
variants), DistMult, ComplEx.

Parity with ref:hyperbolic_src/hyperbolic_decoder.py.

TPU-native scoring core
-----------------------
The reference computes Möbius-difference distance scores with a
double-chunked Python loop expanding (Bq, Cq, d) intermediates
(ref :89-179) and a streaming log-sum-exp CE (ref :182-307) because a
full [B, N, d] expansion would OOM. Here the norm of the Möbius
difference is expanded algebraically:

    diff = mobius_add(-q, x);  with  p = <q, x>, qq = ||q||^2, xx = ||x||^2
    A = 1 - 2c p + c xx        (coefficient of -q)
    B = 1 - c qq               (coefficient of  x)
    D = 1 - 2c p + c^2 qq xx   (+eps)
    ||diff||^2 = (A^2 qq - 2 A B p + B^2 xx) / D^2

so the entire [B, N] score matrix comes from ONE [B,d]x[d,N] GEMM (MXU)
plus elementwise work — no [B, N, d] tensor ever exists and no chunk
loop is needed. Mathematically identical to the reference's chunked
expansion (including its ball projection, reproduced as a norm clamp).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regcn_tpu.hyperbolic import ops as H
from regcn_tpu.models import decoders as euclidean_decoders
from regcn_tpu.utils.init import torch_linear_uniform, xavier_uniform

Params = Dict[str, jax.Array]

SCORE_EPS = 1e-6  # ref SCORE_SCALE_EPSILON
REL_C_EPS = 1e-5  # ref REL_CURVATURE_EPSILON
REL_C_MARGIN = 0.999
REL_C_INIT_RATIO = 0.95


def softplus_inverse(x: float, eps: float = 1e-12) -> float:
    return math.log(max(math.exp(float(x)) - 1.0, eps))


def clamp_relation_curvature(rel_c_raw, global_c, warmup_max=None):
    """Two-sided clamp (ref :66-86)."""
    upper = REL_C_MARGIN * global_c
    if warmup_max is not None:
        upper = jnp.minimum(upper, warmup_max)
    return jnp.clip(rel_c_raw, REL_C_EPS, upper)


def _mobius_diff_norm_sq(query, candidates, c, eps=SCORE_EPS):
    """||mobius_add(-q, x)||^2 for all (q, x) pairs via one GEMM.

    c may be scalar or per-query [B, 1].
    """
    p = jnp.dot(query, candidates.T, preferred_element_type=jnp.float32)  # [B,N]
    qq = jnp.sum(query * query, axis=-1, keepdims=True)  # [B,1]
    xx = jnp.sum(candidates * candidates, axis=-1)[None, :]  # [1,N]
    A = 1.0 - 2.0 * c * p + c * xx
    B = 1.0 - c * qq
    D = 1.0 - 2.0 * c * p + (c * c) * qq * xx + eps
    num_sq = A * A * qq - 2.0 * A * B * p + B * B * xx
    return jnp.maximum(num_sq, 0.0) / (D * D)


def dist_score(
    query: jax.Array,  # [B, d] ball points
    candidates: jax.Array,  # [N, d] ball points
    c,
    *,
    candidate_bias: Optional[jax.Array] = None,  # [N]
    score_scale=None,
    score_margin=0.0,
    query_curvature: Optional[jax.Array] = None,  # [B]
    use_hyperbolic_distance: bool = False,
) -> jax.Array:
    """[B, N] Möbius-difference scores (ref :89-179, algebraically fused).

    use_hyperbolic_distance=False: score = margin - ||diff||^2 (proxy).
    True: score = margin - d_c(q, x) with per-query curvature.
    """
    if use_hyperbolic_distance:
        c_eff = c if query_curvature is None else query_curvature.reshape(-1, 1)
        sqrt_c = jnp.sqrt(c_eff + SCORE_EPS)
        diff_sq = _mobius_diff_norm_sq(query, candidates, c_eff)
        diff_norm = jnp.sqrt(jnp.maximum(diff_sq, SCORE_EPS**2))
        max_norm = 1.0 / (sqrt_c + SCORE_EPS) - SCORE_EPS
        diff_norm = jnp.minimum(diff_norm, max_norm)
        dist = (2.0 / (sqrt_c + SCORE_EPS)) * jnp.arctanh(
            jnp.minimum(sqrt_c * diff_norm, 1.0 - SCORE_EPS)
        )
        block = score_margin - dist
    else:
        # the reference's mobius_add projects the diff back into the ball;
        # reproduce as a clamp on the squared norm
        diff_sq = _mobius_diff_norm_sq(query, candidates, c)
        max_norm = 1.0 / jnp.sqrt(c) - 2 * SCORE_EPS
        diff_sq = jnp.minimum(diff_sq, max_norm * max_norm)
        block = score_margin - diff_sq
    if score_scale is not None:
        block = score_scale * block
    if candidate_bias is not None:
        block = block + candidate_bias[None, :]
    return block


# Routing note for the Pallas flash-softmax kernel: round-3 clean
# measurement (tools/bench_scoring.py, 1x v5e, B=1024, value+grad, both
# proxy and true-distance+per-query-curvature paths, N up to 524k):
# XLA's fused dense GEMM+logsumexp wins at EVERY shape (0.71-0.90x for
# the kernel) and does not materialize the [B, N] logits either — its
# fusion already achieves the flash effect. "auto" therefore resolves
# to the dense path; the kernel remains available via streaming=True
# (value+grad parity tested) as the O(B*d + N*d)-memory fallback.


def dist_ce_loss(
    query, candidates, target, c,
    *,
    mask: Optional[jax.Array] = None,
    candidate_bias=None, score_scale=None, score_margin=0.0,
    query_curvature=None, use_hyperbolic_distance=False,
    streaming="auto",
) -> jax.Array:
    """Masked-mean CE over all candidates (ref :182-307).

    The reference streams logsumexp across candidate chunks to bound
    memory (a CUDA OOM workaround); here the Möbius algebra is fused
    into one GEMM and XLA's fusion computes the CE reduction without
    materializing the [B, N] logits — measured fastest at every tested
    shape (see the routing note above), so ``streaming="auto"``
    resolves to the dense path. ``streaming=True`` forces the Pallas
    flash-softmax kernel (ops/pallas_scoring.py; proxy AND
    true-distance with per-query curvature; O(B*d + N*d) memory).
    """
    if streaming == "auto":
        streaming = False
    if streaming:
        from regcn_tpu.ops.pallas_scoring import streaming_dist_ce_loss

        return streaming_dist_ce_loss(
            query, candidates, target, c, mask=mask,
            candidate_bias=candidate_bias, score_scale=score_scale,
            score_margin=score_margin, query_curvature=query_curvature,
            use_hyperbolic_distance=use_hyperbolic_distance,
        )
    logits = dist_score(
        query, candidates, c,
        candidate_bias=candidate_bias, score_scale=score_scale,
        score_margin=score_margin, query_curvature=query_curvature,
        use_hyperbolic_distance=use_hyperbolic_distance,
    )
    logz = jax.nn.logsumexp(logits, axis=1)
    tgt = jnp.take_along_axis(logits, target[:, None], axis=1)[:, 0]
    nll = logz - tgt
    if mask is None:
        return jnp.mean(nll)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ------------------------------------------------------- Givens primitives

def givens_rotation(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Pairwise 2-D rotations (ref :1032-1051). x [B,d], angles [B,d/2] or [d/2]."""
    if angles.ndim == 1:
        angles = jnp.broadcast_to(angles[None, :], (x.shape[0], angles.shape[0]))
    x1, x2 = x[:, 0::2], x[:, 1::2]
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    o1 = ca * x1 - sa * x2
    o2 = sa * x1 + ca * x2
    return jnp.stack([o1, o2], axis=2).reshape(x.shape)


def givens_reflection(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Pairwise reflections (ref :1392-1401)."""
    if angles.ndim == 1:
        angles = jnp.broadcast_to(angles[None, :], (x.shape[0], angles.shape[0]))
    x1, x2 = x[:, 0::2], x[:, 1::2]
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    o1 = ca * x1 + sa * x2
    o2 = sa * x1 - ca * x2
    return jnp.stack([o1, o2], axis=2).reshape(x.shape)


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _score_scale(params):
    return jax.nn.softplus(params["score_scale_raw"]) + SCORE_EPS


def _relation_curvature(params, r_idx, c, warmup_max=None):
    if "rel_curvature_raw" not in params:
        return None
    n = params["rel_curvature_raw"].shape[0]
    base = jnp.remainder(r_idx, n)
    raw = jax.nn.softplus(params["rel_curvature_raw"][base])
    return clamp_relation_curvature(raw, c, warmup_max)


# -------------------------------------------------- tangent ConvTransE / R

def init_hyperbolic_convtranse(rng, num_entities, h_dim, channels=50, kernel=3):
    params, bn_state = euclidean_decoders.init_convtrans(rng, h_dim, channels, kernel)
    params["b"] = jnp.zeros((num_entities,))
    return params, bn_state


def init_hyperbolic_convtransr(rng, num_rels_total, h_dim, channels=50, kernel=3):
    params, bn_state = euclidean_decoders.init_convtrans(rng, h_dim, channels, kernel)
    params["b"] = jnp.zeros((num_rels_total,))
    return params, bn_state


def _leaky_tanh(x):
    """0.9*tanh(x) + 0.1*x — 'leaky tanh' (ref :378-379)."""
    return 0.9 * jnp.tanh(x) + 0.1 * x


def hyperbolic_convtranse_score(
    params, bn_state, entity_embedding, rel_embedding, triples, c,
    mask=None, *, dropouts=(0.0, 0.0, 0.0), rng=None, train=False,
    ent_tan=None,
):
    """Entity scores on tangent-space embeddings (ref :310-413).

    ent_tan, if given, is the pre-activated leaky-tanh tangent table
    (shared across decoders to avoid recomputing the full-table log map).
    """
    if ent_tan is None:
        ent_tan = _leaky_tanh(H.log_map_zero(entity_embedding, c))
    e1 = ent_tan[triples[:, 0]]
    r = rel_embedding[triples[:, 1]]
    stacked = jnp.stack([e1, r], axis=1)
    x, new_bn = euclidean_decoders._convtrans_features(
        params, bn_state, stacked, mask,
        input_dropout=dropouts[0], hidden_dropout=dropouts[1],
        feat_dropout=dropouts[2], rng=rng, train=train,
    )
    scores = jnp.dot(x, ent_tan.T, preferred_element_type=jnp.float32) + params["b"]
    return scores, new_bn


def hyperbolic_convtransr_score(
    params, bn_state, entity_embedding, rel_embedding, triples, c,
    mask=None, *, dropouts=(0.0, 0.0, 0.0), rng=None, train=False,
    ent_tan=None,
):
    """Relation scores (ref :416-510); candidates = evolved rel emb."""
    if ent_tan is None:
        ent_tan = _leaky_tanh(H.log_map_zero(entity_embedding, c))
    e1 = ent_tan[triples[:, 0]]
    e2 = ent_tan[triples[:, 2]]
    stacked = jnp.stack([e1, e2], axis=1)
    x, new_bn = euclidean_decoders._convtrans_features(
        params, bn_state, stacked, mask,
        input_dropout=dropouts[0], hidden_dropout=dropouts[1],
        feat_dropout=dropouts[2], rng=rng, train=train,
    )
    scores = jnp.dot(x, rel_embedding.T, preferred_element_type=jnp.float32) + params["b"]
    return scores, new_bn


# ----------------------------------------------------------------- MuRP

def init_murp(
    rng, num_entities, num_rels_total, h_dim, c_init=0.01,
    init_scale=1e-3, use_entity_bias=False, use_rel_curvature=False,
    score_scale_init=1.0, score_margin_init=1.0,
) -> Params:
    ks = jax.random.split(rng, 2)
    p: Params = {
        "rot_w": jax.random.uniform(ks[0], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "rot_b": jnp.zeros((h_dim,)),
        "trans_w": jax.random.uniform(ks[1], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "trans_b": jnp.zeros((h_dim,)),
        "score_scale_raw": jnp.asarray(float(score_scale_init), jnp.float32),
        "score_margin": jnp.asarray(float(score_margin_init), jnp.float32),
    }
    if use_entity_bias:
        p["entity_bias"] = jnp.zeros((num_entities,))
    if use_rel_curvature:
        theta = softplus_inverse(max(c_init * REL_C_INIT_RATIO, REL_C_EPS))
        p["rel_curvature_raw"] = jnp.full((num_rels_total,), theta, jnp.float32)
    return p


def _murp_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train):
    """Diagonal rotation + Möbius translation query (ref :744-779)."""
    r_idx = triples[:, 1]
    s_emb = H.project_to_ball(entity_embedding[triples[:, 0]], c)
    rot = rel_embedding[r_idx] @ params["rot_w"].T + params["rot_b"]
    s_tan = _dropout(H.log_map_zero(s_emb, c), dropout, rng, train)
    rot_s = H.exp_map_zero(rot * s_tan, c)
    v_r = rel_embedding[r_idx] @ params["trans_w"].T + params["trans_b"]
    t_r = H.exp_map_zero(v_r, c)
    rot_s = H.project_to_ball(rot_s, c)
    t_r = H.project_to_ball(t_r, c)
    return H.mobius_add(rot_s, t_r, c)


def murp_score(
    params, entity_embedding, rel_embedding, triples, c,
    *, dropout=0.0, rng=None, train=False, rel_curvature_max=None,
    use_hyperbolic_distance=None,
):
    query = _murp_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train)
    rel_c = _relation_curvature(params, triples[:, 1], c, rel_curvature_max)
    use_hd = ("rel_curvature_raw" in params) if use_hyperbolic_distance is None else use_hyperbolic_distance
    scores = dist_score(
        query, entity_embedding, c,
        candidate_bias=params.get("entity_bias"),
        score_scale=_score_scale(params), score_margin=params["score_margin"],
        query_curvature=rel_c, use_hyperbolic_distance=use_hd,
    )
    if "entity_bias" in params:
        scores = scores + params["entity_bias"][triples[:, 0]][:, None]
    return scores


def murp_loss(
    params, entity_embedding, rel_embedding, triples, c,
    *, mask=None, dropout=0.0, rng=None, train=True, rel_curvature_max=None,
):
    query = _murp_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train)
    rel_c = _relation_curvature(params, triples[:, 1], c, rel_curvature_max)
    return dist_ce_loss(
        query, entity_embedding, triples[:, 2], c, mask=mask,
        candidate_bias=params.get("entity_bias"),
        score_scale=_score_scale(params), score_margin=params["score_margin"],
        query_curvature=rel_c,
        use_hyperbolic_distance="rel_curvature_raw" in params,
    )


def init_murp_rel(rng, num_rels_base, h_dim) -> Params:
    ks = jax.random.split(rng, 2)
    return {
        "w_s": xavier_uniform(ks[0], (h_dim, h_dim)),
        "w_o": xavier_uniform(ks[1], (h_dim, h_dim)),
        "rel_bias": jnp.zeros((num_rels_base * 2,)),
    }


def _murp_rel_query(params, entity_embedding, triples, c, dropout, rng, train):
    s_tan = H.log_map_zero(entity_embedding[triples[:, 0]], c)
    o_tan = H.log_map_zero(entity_embedding[triples[:, 2]], c)
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    s_tan = _dropout(s_tan, dropout, k1, train)
    o_tan = _dropout(o_tan, dropout, k2, train)
    return H.exp_map_zero(s_tan @ params["w_s"] + o_tan @ params["w_o"], c)


def murp_rel_score(params, entity_embedding, rel_embedding, triples, c,
                   *, dropout=0.0, rng=None, train=False):
    """Relation scores via Möbius-projected query (ref :859-895)."""
    query = _murp_rel_query(params, entity_embedding, triples, c, dropout, rng, train)
    rel_hyp = H.exp_map_zero(rel_embedding, c)
    return dist_score(query, rel_hyp, c, candidate_bias=params["rel_bias"])


def murp_rel_loss(params, entity_embedding, rel_embedding, triples, c,
                  *, mask=None, dropout=0.0, rng=None, train=True):
    query = _murp_rel_query(params, entity_embedding, triples, c, dropout, rng, train)
    rel_hyp = H.exp_map_zero(rel_embedding, c)
    return dist_ce_loss(query, rel_hyp, triples[:, 1], c, mask=mask,
                        candidate_bias=params["rel_bias"])


# ----------------------------------------------------------------- RotH

def init_roth(
    rng, num_entities, num_rels_total, h_dim, c_init=0.01,
    init_scale=1e-3, use_entity_bias=False, use_rel_curvature=False,
    score_scale_init=1.0, score_margin_init=1.0,
) -> Params:
    assert h_dim % 2 == 0, "h_dim must be even for Givens rotation"
    ks = jax.random.split(rng, 4)
    p: Params = {
        "rot_w": jax.random.uniform(ks[0], (h_dim // 2, h_dim), minval=-init_scale, maxval=init_scale),
        "rot_b": jnp.zeros((h_dim // 2,)),
        "trans_w": jax.random.uniform(ks[1], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "trans_b": jnp.zeros((h_dim,)),
        "reshape_w1": jax.random.uniform(ks[2], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "reshape_b1": jnp.zeros((h_dim,)),
        "reshape_w2": jax.random.uniform(ks[3], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "reshape_b2": jnp.zeros((h_dim,)),
        "score_scale_raw": jnp.asarray(float(score_scale_init), jnp.float32),
        "score_margin": jnp.asarray(float(score_margin_init), jnp.float32),
    }
    if use_entity_bias:
        p["entity_bias"] = jnp.zeros((num_entities,))
    if use_rel_curvature:
        theta = softplus_inverse(max(c_init * REL_C_INIT_RATIO, REL_C_EPS))
        p["rel_curvature_raw"] = jnp.full((num_rels_total,), theta, jnp.float32)
    return p


def _reshape_tangent(params, x):
    """Residual tangent MLP before Givens pairing (ref :1028-1030)."""
    hidden = jax.nn.relu(x @ params["reshape_w1"].T + params["reshape_b1"])
    return x + hidden @ params["reshape_w2"].T + params["reshape_b2"]


def _roth_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train):
    r_idx = triples[:, 1]
    s_emb = H.project_to_ball(entity_embedding[triples[:, 0]], c)
    s_tan = _dropout(H.log_map_zero(s_emb, c), dropout, rng, train)
    s_tan = _reshape_tangent(params, s_tan)
    angles = rel_embedding[r_idx] @ params["rot_w"].T + params["rot_b"]
    rot_s = H.exp_map_zero(givens_rotation(s_tan, angles), c)
    v_r = rel_embedding[r_idx] @ params["trans_w"].T + params["trans_b"]
    t_r = H.exp_map_zero(v_r, c)
    rot_s = H.project_to_ball(rot_s, c)
    t_r = H.project_to_ball(t_r, c)
    return H.mobius_add(rot_s, t_r, c)


def roth_score(params, entity_embedding, rel_embedding, triples, c,
               *, dropout=0.0, rng=None, train=False, rel_curvature_max=None):
    query = _roth_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train)
    rel_c = _relation_curvature(params, triples[:, 1], c, rel_curvature_max)
    scores = dist_score(
        query, entity_embedding, c,
        candidate_bias=params.get("entity_bias"),
        score_scale=_score_scale(params), score_margin=params["score_margin"],
        query_curvature=rel_c,
        use_hyperbolic_distance="rel_curvature_raw" in params,
    )
    if "entity_bias" in params:
        scores = scores + params["entity_bias"][triples[:, 0]][:, None]
    return scores


def roth_loss(params, entity_embedding, rel_embedding, triples, c,
              *, mask=None, dropout=0.0, rng=None, train=True, rel_curvature_max=None):
    query = _roth_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train)
    rel_c = _relation_curvature(params, triples[:, 1], c, rel_curvature_max)
    return dist_ce_loss(
        query, entity_embedding, triples[:, 2], c, mask=mask,
        candidate_bias=params.get("entity_bias"),
        score_scale=_score_scale(params), score_margin=params["score_margin"],
        query_curvature=rel_c,
        use_hyperbolic_distance="rel_curvature_raw" in params,
    )


def init_roth_rel(rng, num_rels_base, h_dim, init_scale=1e-3,
                  score_scale_init=1.0, score_margin_init=1.0) -> Params:
    assert h_dim % 2 == 0
    ks = jax.random.split(rng, 3)
    return {
        "global_rot": jax.random.uniform(ks[0], (h_dim // 2,), minval=-math.pi, maxval=math.pi),
        "reshape_w1": jax.random.uniform(ks[1], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "reshape_b1": jnp.zeros((h_dim,)),
        "reshape_w2": jax.random.uniform(ks[2], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "reshape_b2": jnp.zeros((h_dim,)),
        "rel_bias": jnp.zeros((num_rels_base * 2,)),
        "score_scale_raw": jnp.asarray(float(score_scale_init), jnp.float32),
        "score_margin": jnp.asarray(float(score_margin_init), jnp.float32),
    }


def _roth_rel_query(params, entity_embedding, triples, c, dropout, rng, train):
    s_tan = _dropout(H.log_map_zero(entity_embedding[triples[:, 0]], c), dropout, rng, train)
    s_tan = _reshape_tangent(params, s_tan)
    rot_s = H.exp_map_zero(givens_rotation(s_tan, params["global_rot"]), c)
    return H.mobius_add(-rot_s, entity_embedding[triples[:, 2]], c)


def roth_rel_score(params, entity_embedding, rel_embedding, triples, c,
                   *, dropout=0.0, rng=None, train=False):
    query = _roth_rel_query(params, entity_embedding, triples, c, dropout, rng, train)
    rel_hyp = H.exp_map_zero(rel_embedding, c)
    return dist_score(query, rel_hyp, c, candidate_bias=params["rel_bias"],
                      score_scale=_score_scale(params), score_margin=params["score_margin"])


def roth_rel_loss(params, entity_embedding, rel_embedding, triples, c,
                  *, mask=None, dropout=0.0, rng=None, train=True):
    query = _roth_rel_query(params, entity_embedding, triples, c, dropout, rng, train)
    rel_hyp = H.exp_map_zero(rel_embedding, c)
    return dist_ce_loss(query, rel_hyp, triples[:, 1], c, mask=mask,
                        candidate_bias=params["rel_bias"],
                        score_scale=_score_scale(params), score_margin=params["score_margin"])


# ----------------------------------------------------------------- AttH

def init_atth(
    rng, num_entities, num_rels_total, h_dim, c_init=0.01,
    init_scale=1e-3, use_entity_bias=False, use_rel_curvature=False,
    score_scale_init=1.0, score_margin_init=1.0,
) -> Params:
    assert h_dim % 2 == 0
    ks = jax.random.split(rng, 4)
    p: Params = {
        "rot_w": jax.random.uniform(ks[0], (h_dim // 2, h_dim), minval=-init_scale, maxval=init_scale),
        "rot_b": jnp.zeros((h_dim // 2,)),
        "ref_w": jax.random.uniform(ks[1], (h_dim // 2, h_dim), minval=-init_scale, maxval=init_scale),
        "ref_b": jnp.zeros((h_dim // 2,)),
        "trans_w": jax.random.uniform(ks[2], (h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "trans_b": jnp.zeros((h_dim,)),
        "attn_w": jax.random.uniform(ks[3], (2 * h_dim, h_dim), minval=-init_scale, maxval=init_scale),
        "attn_b": jnp.zeros((2 * h_dim,)),
        "score_scale_raw": jnp.asarray(float(score_scale_init), jnp.float32),
        "score_margin": jnp.asarray(float(score_margin_init), jnp.float32),
    }
    if use_entity_bias:
        p["entity_bias"] = jnp.zeros((num_entities,))
    if use_rel_curvature:
        theta = softplus_inverse(max(c_init * REL_C_INIT_RATIO, REL_C_EPS))
        p["rel_curvature_raw"] = jnp.full((num_rels_total,), theta, jnp.float32)
    return p


def _atth_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train):
    """Attention-mixed rotation + reflection query (ref :1403-1448)."""
    r_idx = triples[:, 1]
    s_emb = H.project_to_ball(entity_embedding[triples[:, 0]], c)
    s_tan = _dropout(H.log_map_zero(s_emb, c), dropout, rng, train)
    rel_r = rel_embedding[r_idx]
    r_rot = rel_r @ params["rot_w"].T + params["rot_b"]
    r_ref = rel_r @ params["ref_w"].T + params["ref_b"]
    rot_s = givens_rotation(s_tan, r_rot)
    ref_s = givens_reflection(s_tan, r_ref)
    attn_w = rel_r @ params["attn_w"].T + params["attn_b"]
    attn_input = jnp.concatenate([s_tan, rel_r], axis=-1)
    a = jax.nn.sigmoid(jnp.sum(attn_w * attn_input, axis=-1, keepdims=True))
    mixed = H.exp_map_zero(a * rot_s + (1.0 - a) * ref_s, c)
    v_r = rel_r @ params["trans_w"].T + params["trans_b"]
    t_r = H.exp_map_zero(v_r, c)
    mixed = H.project_to_ball(mixed, c)
    t_r = H.project_to_ball(t_r, c)
    return H.mobius_add(mixed, t_r, c)


def atth_score(params, entity_embedding, rel_embedding, triples, c,
               *, dropout=0.0, rng=None, train=False, rel_curvature_max=None):
    query = _atth_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train)
    rel_c = _relation_curvature(params, triples[:, 1], c, rel_curvature_max)
    scores = dist_score(
        query, entity_embedding, c,
        candidate_bias=params.get("entity_bias"),
        score_scale=_score_scale(params), score_margin=params["score_margin"],
        query_curvature=rel_c,
        use_hyperbolic_distance="rel_curvature_raw" in params,
    )
    if "entity_bias" in params:
        scores = scores + params["entity_bias"][triples[:, 0]][:, None]
    return scores


def atth_loss(params, entity_embedding, rel_embedding, triples, c,
              *, mask=None, dropout=0.0, rng=None, train=True, rel_curvature_max=None):
    query = _atth_query(params, entity_embedding, rel_embedding, triples, c, dropout, rng, train)
    rel_c = _relation_curvature(params, triples[:, 1], c, rel_curvature_max)
    return dist_ce_loss(
        query, entity_embedding, triples[:, 2], c, mask=mask,
        candidate_bias=params.get("entity_bias"),
        score_scale=_score_scale(params), score_margin=params["score_margin"],
        query_curvature=rel_c,
        use_hyperbolic_distance="rel_curvature_raw" in params,
    )


def init_atth_rel(rng, num_rels_base, h_dim, init_scale=1e-3,
                  score_scale_init=1.0, score_margin_init=1.0) -> Params:
    assert h_dim % 2 == 0
    ks = jax.random.split(rng, 3)
    return {
        "global_rot": jax.random.uniform(ks[0], (h_dim // 2,), minval=-math.pi, maxval=math.pi),
        "global_ref": jax.random.uniform(ks[1], (h_dim // 2,), minval=-math.pi, maxval=math.pi),
        "attn_weight": jax.random.uniform(ks[2], (2 * h_dim,), minval=-init_scale, maxval=init_scale),
        "rel_bias": jnp.zeros((num_rels_base * 2,)),
        "score_scale_raw": jnp.asarray(float(score_scale_init), jnp.float32),
        "score_margin": jnp.asarray(float(score_margin_init), jnp.float32),
    }


def _atth_rel_query(params, entity_embedding, triples, c, dropout, rng, train):
    s_tan = H.log_map_zero(entity_embedding[triples[:, 0]], c)
    o_tan = H.log_map_zero(entity_embedding[triples[:, 2]], c)
    s_tan = _dropout(s_tan, dropout, rng, train)
    rot_s = givens_rotation(s_tan, params["global_rot"])
    ref_s = givens_reflection(s_tan, params["global_ref"])
    attn_input = jnp.concatenate([s_tan, o_tan], axis=-1)
    a = jax.nn.sigmoid(attn_input @ params["attn_weight"])[:, None]
    mixed = H.exp_map_zero(a * rot_s + (1.0 - a) * ref_s, c)
    return H.mobius_add(-mixed, entity_embedding[triples[:, 2]], c)


def atth_rel_score(params, entity_embedding, rel_embedding, triples, c,
                   *, dropout=0.0, rng=None, train=False):
    query = _atth_rel_query(params, entity_embedding, triples, c, dropout, rng, train)
    rel_hyp = H.exp_map_zero(rel_embedding, c)
    return dist_score(query, rel_hyp, c, candidate_bias=params["rel_bias"],
                      score_scale=_score_scale(params), score_margin=params["score_margin"])


def atth_rel_loss(params, entity_embedding, rel_embedding, triples, c,
                  *, mask=None, dropout=0.0, rng=None, train=True):
    query = _atth_rel_query(params, entity_embedding, triples, c, dropout, rng, train)
    rel_hyp = H.exp_map_zero(rel_embedding, c)
    return dist_ce_loss(query, rel_hyp, triples[:, 1], c, mask=mask,
                        candidate_bias=params["rel_bias"],
                        score_scale=_score_scale(params), score_margin=params["score_margin"])


# --------------------------------------------- DistMult / ComplEx (tangent)

def distmult_score(entity_embedding, rel_embedding, triples, c,
                   *, dropout=0.0, rng=None, train=False):
    """Bilinear tangent scores against all entities (ref :513-570)."""
    ent_tan = _dropout(H.log_map_zero(entity_embedding, c), dropout, rng, train)
    s = ent_tan[triples[:, 0]]
    r = rel_embedding[triples[:, 1]]
    return jnp.dot(s * r, ent_tan.T, preferred_element_type=jnp.float32)


def complex_score(entity_embedding, rel_embedding, triples, c,
                  *, dropout=0.0, rng=None, train=False):
    """ComplEx scores with tangent real/imag split (ref :573-636)."""
    ent_tan = _dropout(H.log_map_zero(entity_embedding, c), dropout, rng, train)
    half = ent_tan.shape[-1] // 2
    ent_re, ent_im = ent_tan[:, :half], ent_tan[:, half:]
    rel_re, rel_im = rel_embedding[:, :half], rel_embedding[:, half:]
    s_re = ent_re[triples[:, 0]]
    s_im = ent_im[triples[:, 0]]
    r_re = rel_re[triples[:, 1]]
    r_im = rel_im[triples[:, 1]]
    score_re = jnp.dot(s_re * r_re - s_im * r_im, ent_re.T, preferred_element_type=jnp.float32)
    score_im = jnp.dot(s_re * r_im + s_im * r_re, ent_im.T, preferred_element_type=jnp.float32)
    return score_re + score_im
