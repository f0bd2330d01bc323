"""Scoring decoders: ConvTransE (entities) and ConvTransR (relations).

Parity with ref:src/decoder.py:55-100 (ConvTransE) and :10-52
(ConvTransR): tanh the entity table, stack [head; rel] (or [head; tail])
as a 2-channel length-d signal, BatchNorm -> dropout -> Conv1d(2->C,k=3,
same) -> BatchNorm -> relu -> flatten -> Linear(C*d -> d) -> dropout ->
BatchNorm -> relu -> scores against all candidates via one [B,d]x[d,N]
GEMM (MXU-friendly).

TPU-first differences:
- BatchNorm is functional (stats threaded through a state pytree), and
  batch statistics are computed over *masked* rows only so padded triples
  never pollute them (the reference has no padding; divergence is benign
  and documented).
- The Conv1d(k=3) is expressed as a dense contraction over a 3-tap
  unfold; XLA fuses it with the surrounding elementwise work.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regcn_tpu.utils.init import torch_linear_uniform

Params = Dict[str, jax.Array]
BNState = Dict[str, jax.Array]

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def _init_bn(c: int) -> Tuple[Params, BNState]:
    return (
        {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
    )


def _batch_norm(
    params: Params,
    state: BNState,
    x: jax.Array,  # [..., C, ...] with channel axis `axis`
    mask: Optional[jax.Array],  # [B] over leading batch axis, or None
    *,
    axis: int,
    train: bool,
) -> Tuple[jax.Array, BNState]:
    """BatchNorm1d with optional row masking (stats over valid rows only)."""
    c = x.shape[axis]
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    shape = [1] * x.ndim
    shape[axis] = c

    x32 = x.astype(jnp.float32)  # stats always accumulate in fp32
    if train:
        if mask is not None:
            mshape = [1] * x.ndim
            mshape[0] = x.shape[0]
            m = mask.astype(jnp.float32).reshape(mshape)
            denom = jnp.maximum(jnp.sum(m) * (x.size / (x.shape[0] * c)), 1.0)
            mean = jnp.sum(x32 * m, axis=reduce_axes) / denom
            var = jnp.sum(m * (x32 - mean.reshape(shape)) ** 2, axis=reduce_axes) / denom
        else:
            mean = jnp.mean(x32, axis=reduce_axes)
            var = jnp.var(x32, axis=reduce_axes)
        new_state = {
            "mean": (1 - _BN_MOMENTUM) * state["mean"] + _BN_MOMENTUM * mean,
            "var": (1 - _BN_MOMENTUM) * state["var"] + _BN_MOMENTUM * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    inv = jax.lax.rsqrt(var.reshape(shape) + _BN_EPS)
    out = (x32 - mean.reshape(shape)) * inv * params["scale"].reshape(
        shape
    ).astype(jnp.float32) + params["bias"].reshape(shape).astype(jnp.float32)
    return out.astype(x.dtype), new_state


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def init_convtrans(
    rng: jax.Array, h_dim: int, channels: int = 50, kernel: int = 3
) -> Tuple[Params, BNState]:
    """Shared init for ConvTransE/R (identical pipelines, different stacks)."""
    ks = jax.random.split(rng, 4)
    conv_fan_in = 2 * kernel
    fc_fan_in = h_dim * channels
    params: Params = {
        "conv_w": torch_linear_uniform(ks[0], (channels, 2, kernel), conv_fan_in),
        "conv_b": torch_linear_uniform(ks[1], (channels,), conv_fan_in),
        "fc_w": torch_linear_uniform(ks[2], (h_dim, fc_fan_in), fc_fan_in),
        "fc_b": torch_linear_uniform(ks[3], (h_dim,), fc_fan_in),
    }
    state: BNState = {}
    for name, c in (("bn0", 2), ("bn1", channels), ("bn2", h_dim)):
        p, s = _init_bn(c)
        params[name] = p
        state[name] = s
    return params, state


def _conv1d_same(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """[B, Cin, L] conv with [Cout, Cin, K] weights, same padding.

    Runs in the input dtype (the TPU convolution accumulates fp32
    internally regardless); forcing an fp32 output dtype breaks the
    transpose rule under bf16 compute (mixed-dtype conv arguments)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None].astype(x.dtype)


def _convtrans_features(
    params: Params,
    state: BNState,
    stacked: jax.Array,  # [B, 2, d]
    mask: Optional[jax.Array],
    *,
    input_dropout: float,
    hidden_dropout: float,
    feat_dropout: float,
    rng: Optional[jax.Array],
    train: bool,
) -> Tuple[jax.Array, BNState]:
    B, _, d = stacked.shape
    ks = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    new_state = dict(state)
    x, new_state["bn0"] = _batch_norm(params["bn0"], state["bn0"], stacked, mask, axis=1, train=train)
    x = _dropout(x, input_dropout, ks[0], train)
    x = _conv1d_same(x, params["conv_w"], params["conv_b"])
    x, new_state["bn1"] = _batch_norm(params["bn1"], state["bn1"], x, mask, axis=1, train=train)
    x = jax.nn.relu(x)
    x = _dropout(x, feat_dropout, ks[1], train)
    x = x.reshape(B, -1)  # [B, C*d], channel-major like torch .view
    x = x @ params["fc_w"].T + params["fc_b"]
    x = _dropout(x, hidden_dropout, ks[2], train)
    x, new_state["bn2"] = _batch_norm(params["bn2"], state["bn2"], x, mask, axis=1, train=train)
    x = jax.nn.relu(x)
    return x, new_state


def convtranse_score(
    params: Params,
    state: BNState,
    embedding: jax.Array,  # [N, d] evolved entity embeddings
    rel_emb: jax.Array,  # [2R, d]
    triples: jax.Array,  # [B, 3] int (s, r, o), padded
    mask: Optional[jax.Array] = None,  # [B]
    *,
    input_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    feat_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    candidate_emb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, BNState]:
    """Entity scores [B, N] (ref:src/decoder.py:78-100)."""
    ent_all = jnp.tanh(embedding)
    e1 = ent_all[triples[:, 0]]
    r = rel_emb[triples[:, 1]]
    stacked = jnp.stack([e1, r], axis=1)  # [B, 2, d]
    x, new_state = _convtrans_features(
        params, state, stacked, mask,
        input_dropout=input_dropout, hidden_dropout=hidden_dropout,
        feat_dropout=feat_dropout, rng=rng, train=train,
    )
    cand = ent_all if candidate_emb is None else candidate_emb
    scores = jnp.dot(x, cand.T, preferred_element_type=jnp.float32)
    return scores, new_state


def convtransr_score(
    params: Params,
    state: BNState,
    embedding: jax.Array,
    rel_emb: jax.Array,  # [2R, d] candidates
    triples: jax.Array,  # [B, 3]
    mask: Optional[jax.Array] = None,
    *,
    input_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    feat_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jax.Array, BNState]:
    """Relation scores [B, 2R] (ref:src/decoder.py:29-52)."""
    ent_all = jnp.tanh(embedding)
    e1 = ent_all[triples[:, 0]]
    e2 = ent_all[triples[:, 2]]
    stacked = jnp.stack([e1, e2], axis=1)
    x, new_state = _convtrans_features(
        params, state, stacked, mask,
        input_dropout=input_dropout, hidden_dropout=hidden_dropout,
        feat_dropout=feat_dropout, rng=rng, train=train,
    )
    scores = jnp.dot(x, rel_emb.T, preferred_element_type=jnp.float32)
    return scores, new_state
