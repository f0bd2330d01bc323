"""Poincaré-ball and Lorentz-model operations as pure jnp functions.

TPU-native re-design of ref:hyperbolic_src/hyperbolic_ops.py:22-598
(``HyperbolicOps`` / ``LorentzOps`` static-method classes): here every op
is a pure function over jnp arrays with the curvature ``c`` passed as a
traced scalar (so learnable/warmup curvature schedules jit cleanly — the
reference must special-case tensor vs float c, e.g. :30-35, :68-74).

Numerics: all atanh/acosh/norm chains follow the reference's epsilon
discipline (EPS=1e-6 clamps before atanh at :115, ball projection after
exp/Möbius ops at :95/:143) and should run in float32 islands even under
bf16 activations.

Conventions: curvature c > 0, ball = {x : c ||x||^2 < 1}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-6


def _norm(x, keepdims=True, eps=EPS):
    # clamp INSIDE the sqrt: sqrt'(0) = inf would otherwise poison
    # gradients of exactly-zero rows (0 * inf = NaN in the VJP) — e.g.
    # empty aggregation segments at the ball origin
    sq = jnp.sum(x * x, axis=-1, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def clamp_norm(x: jax.Array, max_norm, eps: float = EPS) -> jax.Array:
    """Rescale rows whose norm exceeds max_norm (ref :38-53).

    Like every norm/transcendental helper here, computes in an fp32
    island and casts back: under ``compute_dtype=bfloat16`` the eps/clamp
    discipline must not run at 8-bit mantissa (XLA fuses the casts, so
    HBM traffic stays bf16)."""
    x32 = x.astype(jnp.float32)
    norm = _norm(x32, eps=eps)
    clamped = jnp.minimum(norm, max_norm - eps)
    return (x32 * (clamped / norm)).astype(x.dtype)


def project_to_ball(x: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Project into the open Poincaré ball of curvature c (ref :56-74)."""
    max_norm = 1.0 / jnp.sqrt(c) - eps
    return clamp_norm(x, max_norm, eps)


def exp_map_zero(v: jax.Array, c, eps: float = EPS) -> jax.Array:
    """exp_0(v) = tanh(sqrt(c)||v||) v / (sqrt(c)||v||) (ref :77-95)."""
    sqrt_c = jnp.sqrt(c)
    v32 = v.astype(jnp.float32)
    v_norm = _norm(v32, eps=eps)
    out = jnp.tanh(sqrt_c * v_norm) * (v32 / v_norm) / sqrt_c
    return project_to_ball(out, c, eps).astype(v.dtype)


def log_map_zero(x: jax.Array, c, eps: float = EPS) -> jax.Array:
    """log_0(x) = atanh(sqrt(c)||x||) x / (sqrt(c)||x||) (ref :98-116)."""
    sqrt_c = jnp.sqrt(c)
    x32 = x.astype(jnp.float32)
    x_norm = _norm(x32, eps=eps)
    scaled = jnp.minimum(sqrt_c * x_norm, 1.0 - eps)
    return (jnp.arctanh(scaled) * x32 / (sqrt_c * x_norm)).astype(x.dtype)


def conformal_factor(x: jax.Array, c, keepdims: bool = True) -> jax.Array:
    """λ_x = 2 / (1 - c ||x||²) — the Poincaré metric conformal factor."""
    sq = jnp.sum(x * x, axis=-1, keepdims=keepdims)
    return 2.0 / jnp.maximum(1.0 - c * sq, EPS)


def exp_map(v: jax.Array, x: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Exponential map at point x: exp_x(v) = x ⊕ tanh(√c λ_x ||v||/2) v/(√c||v||).

    Needed by the Riemannian optimizer's retraction (the reference
    delegates this to geoopt's RiemannianAdam; SURVEY.md §2.3)."""
    sqrt_c = jnp.sqrt(c)
    v_norm = _norm(v, eps=eps)
    lam = conformal_factor(x, c)
    second = jnp.tanh(sqrt_c * lam * v_norm / 2.0) * v / (sqrt_c * v_norm)
    return project_to_ball(mobius_add(x, second, c, eps), c, eps)


def mobius_add(x: jax.Array, y: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Möbius addition x ⊕_c y (ref :119-143)."""
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)
    y_sq = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * c * xy + c * y_sq) * x + (1 - c * x_sq) * y
    denom = 1 + 2 * c * xy + c * c * x_sq * y_sq
    return project_to_ball(num / (denom + eps), c, eps)


def mobius_matvec(m: jax.Array, x: jax.Array, c, eps: float = EPS) -> jax.Array:
    """M ⊗_c x = exp_0(log_0(x) @ M^T) (ref :146-166; torch F.linear)."""
    tangent = log_map_zero(x, c, eps)
    return exp_map_zero(tangent @ m.T, c, eps)


def hyperbolic_distance(x: jax.Array, y: jax.Array, c, eps: float = EPS) -> jax.Array:
    """d_c(x,y) = (2/sqrt(c)) atanh(sqrt(c) ||(-x) ⊕ y||) (ref :169-191)."""
    sqrt_c = jnp.sqrt(c)
    diff = mobius_add(-x, y, c, eps)
    max_norm = 1.0 / (sqrt_c + eps) - eps
    diff_norm = jnp.clip(_norm(diff, keepdims=False, eps=eps), eps, max_norm)
    return (2.0 / sqrt_c) * jnp.arctanh(sqrt_c * diff_norm)


def get_radius(x: jax.Array, eps: float = EPS) -> jax.Array:
    """Point norm = hyperbolic 'specificity' radius (ref :194-206)."""
    return _norm(x, keepdims=False, eps=eps)


def apply_radius(x: jax.Array, radius, c, eps: float = EPS) -> jax.Array:
    """Rescale points to a target radius, direction-preserving (ref :208-233)."""
    if radius is None:
        return x
    radius = jnp.asarray(radius)
    if radius.ndim == x.ndim - 1:
        radius = radius[..., None]
    max_radius = 1.0 / jnp.sqrt(c) - eps
    # fp32 island, dtype-preserving: a strong-f32 learned curvature (or
    # f32 radius buffer) must not promote a bf16 carry (CLAUDE invariant)
    radius = jnp.clip(radius.astype(jnp.float32), eps, max_radius)
    x32 = x.astype(jnp.float32)
    direction = x32 / _norm(x32, eps=eps)
    return (direction * radius).astype(x.dtype)


def safe_arctanh(x: jax.Array, eps: float = EPS) -> jax.Array:
    return jnp.arctanh(jnp.clip(x, -1 + eps, 1 - eps))


# --------------------------------------------------------------------------
# Tangent-space fused equivalents (TPU fast path)
#
# log_0 and exp_0 are exact inverses at the origin, so a chain
#   exp_0 -> project_to_ball -> log_0
# collapses to a single norm clamp in tangent space. These helpers let the
# scanned recurrence keep its carry in tangent space and skip the paired
# transcendental round trips (the dominant VPU cost of the hyperbolic
# step), while reproducing the exact eps/clamp discipline of the ball-space
# ops above so both paths agree to float tolerance.
# --------------------------------------------------------------------------

def tangent_norm_bound(c, eps: float = EPS):
    """The tangent norm that survives exp_0 -> project -> log_0.

    exp_0 caps the ball norm at tanh(sqrt(c)||v||)/sqrt(c) then projects to
    1/sqrt(c) - 2eps; log_0 additionally clamps sqrt(c)||x|| at 1 - eps.
    """
    sqrt_c = jnp.sqrt(c)
    scaled = jnp.minimum(1.0 - 2.0 * sqrt_c * eps, 1.0 - eps)
    return jnp.arctanh(scaled) / sqrt_c


def clamp_tangent_norm(v: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Tangent-space equivalent of log_0(project_to_ball(exp_0(v)))."""
    bound = tangent_norm_bound(c, eps)
    v32 = v.astype(jnp.float32)
    vn = _norm(v32, eps=eps)
    return (v32 * (jnp.minimum(vn, bound) / vn)).astype(v.dtype)


def radius_from_tangent(v: jax.Array, c, eps: float = EPS) -> jax.Array:
    """get_radius(exp_0(v)) without materialising the ball point: [..., ]."""
    sqrt_c = jnp.sqrt(c)
    vn = _norm(v.astype(jnp.float32), keepdims=False, eps=eps)
    r = jnp.tanh(sqrt_c * vn) / sqrt_c
    r = jnp.maximum(jnp.minimum(r, 1.0 / sqrt_c - 2.0 * eps), eps)
    return r.astype(v.dtype)


def apply_radius_tangent(v: jax.Array, radius, c, eps: float = EPS) -> jax.Array:
    """log_0(apply_radius(exp_0(v), radius)): set tangent norm so the ball
    point lands exactly at ``radius`` (direction preserved)."""
    radius = jnp.asarray(radius)
    if radius.ndim == v.ndim - 1:
        radius = radius[..., None]
    sqrt_c = jnp.sqrt(c)
    max_radius = 1.0 / sqrt_c - eps
    radius = jnp.clip(radius.astype(jnp.float32), eps, max_radius)
    target_vn = jnp.arctanh(jnp.minimum(sqrt_c * radius, 1.0 - eps)) / sqrt_c
    v32 = v.astype(jnp.float32)
    return ((v32 / _norm(v32, eps=eps)) * target_vn).astype(v.dtype)


def embedding_stats(x: jax.Array, c) -> dict:
    """Norm statistics for observability (ref :236-269)."""
    r = get_radius(x)
    max_r = 1.0 / jnp.sqrt(c)
    return {
        "mean_norm": jnp.mean(r),
        "max_norm": jnp.max(r),
        "min_norm": jnp.min(r),
        "std_norm": jnp.std(r),
        "pct_near_boundary": jnp.mean((r > 0.9 * max_r).astype(jnp.float32)) * 100.0,
    }


# --------------------------------------------------------------------------
# Lorentz / hyperboloid model (ref :442-598)
# --------------------------------------------------------------------------

def lorentz_inner(x: jax.Array, y: jax.Array, keepdims: bool = False) -> jax.Array:
    """Minkowski inner product <x,y>_L = -x0 y0 + sum_i xi yi (ref :460-474)."""
    t = jnp.sum(x[..., :1] * y[..., :1], axis=-1, keepdims=keepdims)
    s = jnp.sum(x[..., 1:] * y[..., 1:], axis=-1, keepdims=keepdims)
    return -t + s


def to_lorentz(x: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Poincaré ball -> Lorentz manifold, <y,y>_L = -1/c (ref :476-499)."""
    sqrt_c = jnp.sqrt(c)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)
    denom = jnp.maximum(1.0 - c * x_sq, eps)
    x0 = (1.0 + c * x_sq) / (sqrt_c * denom)
    xi = 2.0 * x / denom
    return jnp.concatenate([x0, xi], axis=-1)


def to_poincare(y: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Lorentz manifold -> Poincaré ball (ref :501-518)."""
    sqrt_c = jnp.sqrt(c)
    denom = jnp.maximum(1.0 + y[..., :1] * sqrt_c, eps)
    return y[..., 1:] / denom


def lorentz_log_map(x: jax.Array, base: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Log map at a base point on the hyperboloid (ref :520-539)."""
    # NOTE the reference's clamp binds BEFORE negation
    # (``-inner.clamp(max=-1-eps)``), so alpha = -<base,x>_L >= 1+eps
    alpha = jnp.maximum(-lorentz_inner(base, x, keepdims=True), 1.0 + eps)
    coef = jnp.arccosh(alpha * jnp.sqrt(c)) / jnp.sqrt(
        jnp.maximum(alpha**2 - 1.0, eps)
    )
    return coef * (x - alpha * base)


def lorentz_exp_map(v: jax.Array, base: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Exp map at a base point on the hyperboloid (ref :541-560)."""
    v_norm = jnp.sqrt(jnp.maximum(lorentz_inner(v, v, keepdims=True), eps))
    sqrt_c = jnp.sqrt(c)
    coef = jnp.sinh(sqrt_c * v_norm) / (sqrt_c * v_norm + eps)
    return jnp.cosh(sqrt_c * v_norm) * base + coef * v


def lorentz_normalize(x: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Project onto the manifold: rescale so <x,x>_L = -1/c (ref :578-581)."""
    ip = lorentz_inner(x, x, keepdims=True)
    scale = jnp.sqrt(jnp.maximum(-ip * c, eps))
    return x / scale


def lorentz_centroid_segments(
    emb: jax.Array,  # [E, d+1] points on the hyperboloid
    weights: jax.Array,  # [E] non-negative
    segment_ids: jax.Array,  # [E]
    num_segments: int,
    c,
    eps: float = EPS,
) -> jax.Array:
    """Per-segment weighted Lorentz centroid (Fréchet-mean approximation).

    Vectorised replacement for the reference's per-node Python loop
    (ref:hyperbolic_layers.py:613-625 calling ref :563-581 per node):
    one segment-sum over all edges instead of a loop over nodes.
    Empty segments return the origin of the hyperboloid.
    """
    wsum = jax.ops.segment_sum(weights, segment_ids, num_segments=num_segments)
    w = weights / (wsum[segment_ids] + eps)
    centroid = jax.ops.segment_sum(w[:, None] * emb, segment_ids, num_segments=num_segments)
    # empty segments: put the hyperboloid origin (1/sqrt(c), 0, ...)
    origin = jnp.concatenate(
        [jnp.full((num_segments, 1), 1.0 / jnp.sqrt(c)),
         jnp.zeros((num_segments, emb.shape[-1] - 1))], axis=-1
    )
    empty = (wsum <= eps)[:, None]
    centroid = jnp.where(empty, origin, centroid)
    # fp32 island: the fp32 weights/origin upcast the reduction; cast back
    # so the op is dtype-preserving under compute_dtype=bfloat16
    return lorentz_normalize(centroid, c, eps).astype(emb.dtype)


def lorentz_distance(x: jax.Array, y: jax.Array, c, eps: float = EPS) -> jax.Array:
    """Geodesic distance on the hyperboloid (ref :583-598)."""
    alpha = jnp.minimum(lorentz_inner(x, y), -1.0 - eps)
    return (1.0 / jnp.sqrt(c)) * jnp.arccosh(-alpha * jnp.sqrt(c))


# --------------------------------------------------------------------------
# Einstein midpoint (used by FHNN/HGAT aggregation, ref:hyperbolic_layers.py
# :371-395) — vectorised over segments.
# --------------------------------------------------------------------------

def einstein_midpoint_segments(
    points: jax.Array,  # [E, d] Poincaré-ball points
    weights: jax.Array,  # [E] aggregation weights (>= 0)
    segment_ids: jax.Array,
    num_segments: int,
    c,
    eps: float = EPS,
) -> jax.Array:
    """Per-segment Einstein midpoint with conformal-factor weighting.

    Matches ref:hyperbolic_layers.py:371-395 exactly:
    λ_i = 2 / (1 - c ||x_i||² + eps); midpoint = Σ w_i λ_i x_i / Σ w_i λ_i,
    projected to the ball. ``weights`` here are the *unnormalised*
    per-edge weights; the reference normalises per node first
    (ref :428), which this reproduces via per-segment weight sums.
    Empty segments return 0 (ball origin), matching DGL's zero fill for
    message-less nodes.
    """
    wsum = jax.ops.segment_sum(weights, segment_ids, num_segments=num_segments)
    w = weights / (wsum[segment_ids] + eps)
    # fp32 island for the conformal factor: 1 - c*||x||^2 cancels
    # catastrophically in bf16 near the ball boundary (~0.008 resolution
    # near 1), quantizing the aggregation weights
    pf = points.astype(jnp.float32)
    sq = jnp.sum(pf * pf, axis=-1)
    lam = 2.0 / (1.0 - jnp.asarray(c, jnp.float32) * sq + eps)
    wl = w * lam
    denom = jax.ops.segment_sum(wl, segment_ids, num_segments=num_segments) + eps
    num = jax.ops.segment_sum(wl[:, None] * points, segment_ids, num_segments=num_segments)
    mid = num / denom[:, None]
    mid = jnp.where((wsum <= 0)[:, None], 0.0, mid)
    # fp32 island: fp32 weights upcast the reduction; cast back so the op
    # is dtype-preserving under compute_dtype=bfloat16
    return project_to_ball(mid, c, eps).astype(points.dtype)
