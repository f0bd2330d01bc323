"""Pallas TPU kernel: fused Möbius-distance scoring with streaming CE.

The hyperbolic decoders score a query batch against every candidate
entity (ref:hyperbolic_src/hyperbolic_decoder.py:89-307 implements this
as a double-chunked torch loop). The XLA path in
:mod:`regcn_tpu.hyperbolic.decoders` already fuses the distance algebra
into one GEMM; this kernel goes one step further for the training loss:
the [B, N] logit matrix NEVER leaves VMEM — each candidate tile computes
its logits on the MXU and immediately folds them into a running
(max, sum-exp, target-logit) accumulator, flash-softmax style, so HBM
traffic is O(B*d + N*d) instead of O(B*N).

Math (proxy distance, parity with the ball-projected Möbius difference):
    p  = q @ x^T ; qq = ||q||^2 ; xx = ||x||^2
    A  = 1 - 2c p + c xx ; Bc = 1 - c qq ; D = 1 - 2c p + c^2 qq xx + eps
    dist_sq = clamp((A^2 qq - 2 A Bc p + Bc^2 xx) / D^2, <= max^2)
    logit   = scale * (margin - dist_sq) + bias
    CE      = mean_valid(-logit[target] + logsumexp(logits))
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCORE_EPS = 1e-6


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _arctanh(z):
    """0.5*log((1+z)/(1-z)) — spelled out for the Pallas TPU lowering."""
    return 0.5 * (jnp.log1p(z) - jnp.log1p(-z))


def _ce_kernel(
    # inputs
    q_ref,  # [B, d] queries (VMEM)
    qq_ref,  # [B, 1] squared query norms
    x_ref,  # [CN, d] candidate tile (VMEM, grid over N)
    xx_ref,  # [CN, 1] squared candidate norms
    bias_ref,  # [CN, 1] candidate bias tile
    target_ref,  # [B, 1] int32 targets
    cq_ref,  # [B, 1] per-query curvature (broadcast scalar when uniform)
    scalars_ref,  # [1, 2] (scale, margin) f32
    # outputs
    m_ref,  # [B, 1] running max
    s_ref,  # [B, 1] running sum-exp
    t_ref,  # [B, 1] target logit
    *,
    cn: int,
    true_dist: bool,
):
    j = pl.program_id(0)

    scale = scalars_ref[0, 0]
    margin = scalars_ref[0, 1]
    c = cq_ref[:]  # [B, 1] — broadcasts against the [B, CN] tile

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)
        t_ref[:] = jnp.zeros_like(t_ref)

    q = q_ref[:]
    x = x_ref[:]
    qq = qq_ref[:]  # [B, 1]
    xx = xx_ref[:].T  # [1, CN]
    p = jnp.dot(q, x.T, preferred_element_type=jnp.float32)  # [B, CN] on MXU

    A = 1.0 - 2.0 * c * p + c * xx
    Bc = 1.0 - c * qq
    D = 1.0 - 2.0 * c * p + (c * c) * qq * xx + SCORE_EPS
    num_sq = A * A * qq - 2.0 * A * Bc * p + Bc * Bc * xx
    diff_sq = jnp.maximum(num_sq, 0.0) / (D * D)
    if true_dist:
        # parity with decoders.dist_score(use_hyperbolic_distance=True)
        sqrt_c = jnp.sqrt(c + SCORE_EPS)
        diff_norm = jnp.sqrt(jnp.maximum(diff_sq, SCORE_EPS * SCORE_EPS))
        max_norm = 1.0 / (sqrt_c + SCORE_EPS) - SCORE_EPS
        diff_norm = jnp.minimum(diff_norm, max_norm)
        dist = (2.0 / (sqrt_c + SCORE_EPS)) * _arctanh(
            jnp.minimum(sqrt_c * diff_norm, 1.0 - SCORE_EPS))
        block = margin - dist
    else:
        max_norm = 1.0 / jnp.sqrt(c) - 2.0 * SCORE_EPS
        block = margin - jnp.minimum(diff_sq, max_norm * max_norm)
    logits = scale * block + bias_ref[:].T  # [B, CN]

    # streaming logsumexp
    tile_max = jnp.max(logits, axis=1, keepdims=True)  # [B, 1]
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, tile_max)
    correction = jnp.exp(m_old - m_new)
    s_ref[:] = s_ref[:] * correction + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    # target logit: targets falling in this tile
    tgt = target_ref[:]  # [B, 1] global candidate index
    local = tgt - j * cn
    in_tile = (local >= 0) & (local < cn)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    hit = col_ids == local  # [B, CN]; false everywhere when out of tile
    picked = jnp.sum(jnp.where(hit & in_tile, logits, 0.0), axis=1, keepdims=True)
    t_ref[:] = t_ref[:] + picked


@functools.partial(jax.jit, static_argnames=("block_n", "true_dist"))
def _streaming_ce_parts(q, candidates, bias, target, cq, scale, margin,
                        block_n=512, true_dist=False):
    B, d = q.shape
    N = candidates.shape[0]
    n_pad = _round_up(N, block_n)
    x = jnp.pad(candidates, ((0, n_pad - N), (0, 0)))
    b = jnp.pad(bias, (0, n_pad - N), constant_values=-1e30)  # mask pad cands
    qq = jnp.sum(q * q, axis=1, keepdims=True)
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    scalars = jnp.stack([scale, margin]).reshape(1, 2)

    grid = (n_pad // block_n,)
    m, s, t = pl.pallas_call(
        functools.partial(_ce_kernel, cn=block_n, true_dist=true_dist),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
    )(
        q.astype(jnp.float32), qq.astype(jnp.float32), x.astype(jnp.float32),
        xx.astype(jnp.float32), b.reshape(-1, 1).astype(jnp.float32),
        target.reshape(-1, 1).astype(jnp.int32),
        cq.reshape(-1, 1).astype(jnp.float32), scalars.astype(jnp.float32),
    )
    return m, s, t


def _tile_logits(q, x_t, b_t, cq, scale, margin, true_dist):
    """Logits for one candidate tile — the exact math of ``_ce_kernel``
    in plain jnp, so the backward pass can recompute it tile-by-tile and
    let autodiff produce the Möbius-algebra gradients."""
    c = cq.reshape(-1, 1)
    qq = jnp.sum(q * q, axis=1, keepdims=True)
    xx = jnp.sum(x_t * x_t, axis=1)[None, :]
    p = jnp.dot(q, x_t.T, preferred_element_type=jnp.float32)
    A = 1.0 - 2.0 * c * p + c * xx
    Bc = 1.0 - c * qq
    D = 1.0 - 2.0 * c * p + (c * c) * qq * xx + SCORE_EPS
    num_sq = A * A * qq - 2.0 * A * Bc * p + Bc * Bc * xx
    diff_sq = jnp.maximum(num_sq, 0.0) / (D * D)
    if true_dist:
        sqrt_c = jnp.sqrt(c + SCORE_EPS)
        diff_norm = jnp.sqrt(jnp.maximum(diff_sq, SCORE_EPS * SCORE_EPS))
        max_norm = 1.0 / (sqrt_c + SCORE_EPS) - SCORE_EPS
        diff_norm = jnp.minimum(diff_norm, max_norm)
        dist = (2.0 / (sqrt_c + SCORE_EPS)) * jnp.arctanh(
            jnp.minimum(sqrt_c * diff_norm, 1.0 - SCORE_EPS))
        block = margin - dist
    else:
        max_norm = 1.0 / jnp.sqrt(c) - 2 * SCORE_EPS
        block = margin - jnp.minimum(diff_sq, max_norm * max_norm)
    return scale * block + b_t[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _streaming_nll(q, candidates, bias, target, cq, scale, margin, block_n,
                   true_dist):
    """Per-row NLL [B]: flash-softmax forward (Pallas), tile-recompute
    backward (flash-attention-style custom VJP — the [B, N] logits never
    hit HBM in either direction)."""
    m, s, t = _streaming_ce_parts(q, candidates, bias, target, cq, scale,
                                  margin, block_n=block_n,
                                  true_dist=true_dist)
    lse = (m + jnp.log(jnp.maximum(s, 1e-30)))[:, 0]
    return lse - t[:, 0]


def _streaming_nll_fwd(q, candidates, bias, target, cq, scale, margin,
                       block_n, true_dist):
    m, s, t = _streaming_ce_parts(q, candidates, bias, target, cq, scale,
                                  margin, block_n=block_n,
                                  true_dist=true_dist)
    lse = (m + jnp.log(jnp.maximum(s, 1e-30)))[:, 0]
    return lse - t[:, 0], (q, candidates, bias, target, cq, scale, margin, lse)


def _streaming_nll_bwd(block_n, true_dist, res, g):
    q, candidates, bias, target, cq, scale, margin, lse = res
    B, d = q.shape
    N = candidates.shape[0]
    n_pad = _round_up(N, block_n)
    x = jnp.pad(candidates, ((0, n_pad - N), (0, 0)))
    b = jnp.pad(bias, (0, n_pad - N), constant_values=-1e30)
    n_tiles = n_pad // block_n
    xt = x.reshape(n_tiles, block_n, d)
    bt = b.reshape(n_tiles, block_n)

    def step(carry, tile):
        dq, dcq, dscale, dmargin, j = carry
        x_t, b_t = tile
        logits, vjp = jax.vjp(
            lambda q_, x_, b_, c_, s_, m_: _tile_logits(
                q_, x_, b_, c_, s_, m_, true_dist),
            q, x_t, b_t, cq, scale, margin)
        p = jnp.exp(logits - lse[:, None])
        local = target - j * block_n
        onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                  == local[:, None]).astype(logits.dtype)
        dlogits = g[:, None] * (p - onehot)
        dq_t, dx_t, db_t, dc_t, ds_t, dm_t = vjp(dlogits)
        return ((dq + dq_t, dcq + dc_t, dscale + ds_t, dmargin + dm_t, j + 1),
                (dx_t, db_t))

    init = (jnp.zeros_like(q), jnp.zeros_like(cq), jnp.zeros_like(scale),
            jnp.zeros_like(margin), jnp.int32(0))
    (dq, dcq, dscale, dmargin, _), (dx_tiles, db_tiles) = jax.lax.scan(
        step, init, (xt, bt))
    dx = dx_tiles.reshape(n_pad, d)[:N]
    db = db_tiles.reshape(n_pad)[:N]
    dtarget = jnp.zeros(target.shape, dtype=jax.dtypes.float0)
    return dq, dx, db, dtarget, dcq, dscale, dmargin


_streaming_nll.defvjp(_streaming_nll_fwd, _streaming_nll_bwd)


def streaming_dist_ce_loss(
    query: jax.Array,  # [B, d] ball points
    candidates: jax.Array,  # [N, d]
    target: jax.Array,  # [B]
    c,
    *,
    mask: jax.Array | None = None,
    candidate_bias: jax.Array | None = None,
    score_scale=None,
    score_margin=0.0,
    query_curvature: jax.Array | None = None,  # [B]
    use_hyperbolic_distance: bool = False,
    block_n: int = 512,
) -> jax.Array:
    """Masked-mean CE, numerically identical to
    :func:`regcn_tpu.hyperbolic.decoders.dist_ce_loss` — both the
    proxy-distance path and the true-distance path with per-query
    (relation-specific) curvature (ref:hyperbolic_decoder.py:704-727) —
    with on-chip streaming logsumexp; differentiable w.r.t. query,
    candidates, bias, curvature (incl. per-query), scale and margin."""
    B = query.shape[0]
    N = candidates.shape[0]
    bias = (candidate_bias if candidate_bias is not None
            else jnp.zeros((N,), jnp.float32))
    scale = jnp.asarray(1.0 if score_scale is None else score_scale, jnp.float32)
    margin = jnp.asarray(score_margin, jnp.float32)
    if query_curvature is None or not use_hyperbolic_distance:
        # the dense proxy path (decoders.dist_score else-branch) uses the
        # GLOBAL curvature even when query_curvature is supplied; mirror
        # that so streaming == dense on every argument combination
        cq = jnp.broadcast_to(jnp.asarray(c, jnp.float32).reshape(()), (B,))
    else:
        cq = query_curvature.reshape(-1).astype(jnp.float32)
    nll = _streaming_nll(
        query.astype(jnp.float32), candidates.astype(jnp.float32),
        bias.astype(jnp.float32), target, cq, scale, margin, block_n,
        bool(use_hyperbolic_distance),
    )
    if mask is None:
        return jnp.mean(nll)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
