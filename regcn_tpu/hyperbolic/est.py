"""EST subsystem: persistent entity memory + event-history retrieval.

Parity with ref:hyperbolic_src/est_components.py and the integration
helpers in ref:hyperbolic_src/hyperbolic_model.py:537-671:

- H-PES  (PersistentEntityState, ref:est_components.py:32-156): fast
  (EMA) and slow (gated) tangent-space memories. TPU design: the buffers
  live in an :class:`ESTState` pytree threaded through the train step —
  no in-place module mutation; the slow state rides in checkpoints.
- H-TDP  (TimeDeltaProjection, ref :163-214): exp_0(MLP(log1p Δt)).
- ETNR   (HyperbolicTemporalIndex, ref :221-326): host-side numpy event
  index; queries return padded [B, K] device batches.
- QCHHE  (HyperbolicHistoryEncoder, ref :333-472): tangent-projected
  (neighbor, relation, Δt) features, query-conditioned bias/gate, GRU or
  Transformer backbone, masked attention pooling, exp-map out.
- TANS   (ref :479-555): host-built (query,candidate) COO masks applied
  as one scatter instead of a per-row Python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.hyperbolic import ops as H
from regcn_tpu.models.layers import gru_cell, init_gru_cell
from regcn_tpu.utils.init import torch_linear_uniform, xavier_uniform

Params = Dict[str, jax.Array]

CLAMP = 10.0


# ----------------------------------------------------------------- H-PES

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ESTState:
    """Persistent entity memory buffers (tangent space).

    ``slow`` is checkpointed (parity: persistent buffer, ref :66);
    ``fast`` is transient (persistent=False, ref :67-68).
    """

    fast: jax.Array  # [N, d]
    slow: jax.Array  # [N, d]


def init_est_state(num_ents: int, h_dim: int) -> ESTState:
    return ESTState(fast=jnp.zeros((num_ents, h_dim)), slow=jnp.zeros((num_ents, h_dim)))


def init_est_params(rng: jax.Array, cfg) -> Params:
    """All EST learnable parameters (H-PES gate, H-TDP MLP, QCHHE, fusion)."""
    d = cfg.h_dim
    ks = jax.random.split(rng, 10)
    p: Params = {
        # H-PES gate (ref :71-72)
        "slow_threshold": jnp.asarray(0.5, jnp.float32),
        "slow_scale": jnp.asarray(2.0, jnp.float32),
        # H-TDP MLP 1 -> d -> d (ref :185-191); xavier weights, torch-default biases
        "tdp_w1": xavier_uniform(ks[0], (d, 1)),
        "tdp_b1": torch_linear_uniform(ks[1], (d,), 1),
        "tdp_w2": xavier_uniform(ks[2], (d, d)),
        "tdp_b2": torch_linear_uniform(ks[3], (d,), d),
        # QCHHE projections (ref :366-400)
        "hist_proj_w": xavier_uniform(ks[4], (d, 3 * d)),
        "hist_proj_b": jnp.zeros((d,)),
        "cond_in_w": xavier_uniform(ks[5], (d, d)),
        "cond_in_b": jnp.zeros((d,)),
        "cond_gate_w": xavier_uniform(ks[6], (d, d)),
        "cond_gate_b": jnp.zeros((d,)),
        "attn_proj_w": xavier_uniform(ks[7], (1, 2 * d)),
        "attn_proj_b": jnp.zeros((1,)),
        "out_norm_scale": jnp.ones((d,)),
        "out_norm_bias": jnp.zeros((d,)),
        # fusion gate (ref:hyperbolic_model.py:508-510)
        "fusion_gate_w": xavier_uniform(ks[8], (d, 2 * d)),
        "fusion_gate_b": jnp.zeros((d,)),
    }
    if cfg.est_encoder == "gru":
        p["qchhe_gru"] = init_gru_cell(ks[9], d, d)
    elif cfg.est_encoder == "transformer":
        p["qchhe_transformer"] = _init_transformer(ks[9], d, n_heads=4, n_layers=2)
    else:
        raise ValueError(f"unknown est encoder {cfg.est_encoder!r}")
    return p


def inject_slow_state(params: Params, h_hyp: jax.Array, slow: jax.Array, c,
                      entity_ids: Optional[jax.Array] = None) -> jax.Array:
    """Add the (detached) slow memory in tangent space (ref :74-116)."""
    h_tan = H.log_map_zero(h_hyp, c)
    s = jax.lax.stop_gradient(slow)
    if entity_ids is not None:
        s = s[entity_ids]
    h_tan = jnp.clip(h_tan + s, -CLAMP, CLAMP)
    # dtype-preserving (CLAUDE invariant): the fp32 slow buffer must not
    # promote the bf16 evolution carry (scan carry dtype mismatch)
    return H.project_to_ball(H.exp_map_zero(h_tan, c), c).astype(h_hyp.dtype)


def update_states(
    params: Params, state: ESTState,
    entity_ids: jax.Array,  # [B]
    mask: jax.Array,  # [B] 1=valid
    context_tangent: jax.Array,  # [B, d]
    alpha: float,
) -> ESTState:
    """H-PES writeback (ref :118-151), vectorised over unique entities.

    The reference updates each *unique* batch entity once; here duplicate
    rows are segment-averaged first (identical contexts in practice), and
    padded rows are masked out. Runs on stop_gradient values.
    """
    n, d = state.fast.shape
    ctx = jax.lax.stop_gradient(context_tangent)
    present = jnp.clip(jax.ops.segment_sum(mask, entity_ids, num_segments=n), 0.0, 1.0)
    cnt = jax.ops.segment_sum(mask, entity_ids, num_segments=n)
    ctx_mean = jax.ops.segment_sum(ctx * mask[:, None], entity_ids, num_segments=n)
    ctx_mean = ctx_mean / jnp.maximum(cnt, 1.0)[:, None]

    fast_new = jnp.where(
        present[:, None] > 0,
        (1.0 - alpha) * state.fast + alpha * ctx_mean,
        state.fast,
    )
    delta = fast_new - state.slow
    delta_norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    threshold = jnp.maximum(jax.lax.stop_gradient(params["slow_threshold"]), 1e-6)
    scale = jnp.maximum(jax.lax.stop_gradient(params["slow_scale"]), 0.1)
    gate = jax.nn.sigmoid(scale * (delta_norm - threshold))
    slow_new = jnp.where(present[:, None] > 0, state.slow + gate * delta, state.slow)
    return ESTState(fast=fast_new, slow=slow_new)


# ----------------------------------------------------------------- H-TDP

def time_delta_tangent(params: Params, deltas: jax.Array) -> jax.Array:
    """MLP(log1p Δt) tangent features -> [B, K, d] (ref :193-214)."""
    x = jnp.log1p(deltas.astype(jnp.float32))[..., None]  # [B, K, 1]
    h1 = jax.nn.relu(x @ params["tdp_w1"].T + params["tdp_b1"])
    return h1 @ params["tdp_w2"].T + params["tdp_b2"]


def time_delta_projection(params: Params, deltas: jax.Array, c) -> jax.Array:
    """exp_0(MLP(log1p Δt)) -> [B, K, d] ball points (ref :193-214)."""
    return H.exp_map_zero(time_delta_tangent(params, deltas), c)


# ------------------------------------------------------------------ ETNR

class TemporalIndex:
    """Host-side per-entity event index (ref :221-326).

    build() ingests snapshots; query() returns padded [B, K] numpy arrays
    of the K most-recent events strictly before the query time.
    """

    def __init__(self, history_len: int = 32):
        self.history_len = history_len
        self._index: Dict[int, List[Tuple[int, int, int]]] = {}
        self.num_rels = 0
        self._built = False

    def build(self, snapshot_list: List[np.ndarray], num_rels: int) -> None:
        self._index = {}
        self.num_rels = num_rels
        for t, snapshot in enumerate(snapshot_list):
            if snapshot is None or len(snapshot) == 0:
                continue
            for h_id, r_id, t_id in np.asarray(snapshot)[:, :3]:
                self._index.setdefault(int(h_id), []).append((t, int(r_id), int(t_id)))
                self._index.setdefault(int(t_id), []).append((t, int(r_id) + num_rels, int(h_id)))
        # time-sorted per-entity arrays: query() is a searchsorted, which
        # makes whole-split precomputation (ESTStore) cheap on the host
        self._arrays = {}
        for e, events in self._index.items():
            events.sort(key=lambda x: x[0])
            arr = np.asarray(events, dtype=np.int64).reshape(-1, 3)
            self._arrays[e] = (arr[:, 0], arr[:, 1].astype(np.int32),
                               arr[:, 2].astype(np.int32))
        self._built = True

    def query(self, entity_ids, query_time: int):
        K = self.history_len
        B = len(entity_ids)
        nb_e = np.zeros((B, K), np.int32)
        nb_r = np.zeros((B, K), np.int32)
        dts = np.zeros((B, K), np.float32)
        msk = np.zeros((B, K), np.float32)
        for i, eid in enumerate(entity_ids):
            ev = self._arrays.get(int(eid))
            if ev is None:
                continue
            times, rels, nbs = ev
            end = int(np.searchsorted(times, query_time, side="left"))
            lo = max(0, end - K)
            n = end - lo
            if n == 0:
                continue
            nb_e[i, :n] = nbs[lo:end]
            nb_r[i, :n] = rels[lo:end]
            dts[i, :n] = (query_time - times[lo:end]).astype(np.float32)
            msk[i, :n] = 1.0
        return nb_e, nb_r, dts, msk


# ----------------------------------------------------------------- QCHHE

def _init_transformer(rng, d, n_heads=4, n_layers=2):
    """Minimal post-LN transformer encoder (torch TransformerEncoder spec)."""
    layers = []
    keys = jax.random.split(rng, n_layers)
    for k in keys:
        ks = jax.random.split(k, 6)
        ff = 4 * d
        layers.append({
            "qkv_w": torch_linear_uniform(ks[0], (3 * d, d), d),
            "qkv_b": jnp.zeros((3 * d,)),
            "out_w": torch_linear_uniform(ks[1], (d, d), d),
            "out_b": jnp.zeros((d,)),
            "ff1_w": torch_linear_uniform(ks[2], (ff, d), d),
            "ff1_b": torch_linear_uniform(ks[3], (ff,), d),
            "ff2_w": torch_linear_uniform(ks[4], (d, ff), ff),
            "ff2_b": torch_linear_uniform(ks[5], (d,), ff),
            "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
            "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
        })
    return {"layers": layers}


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _transformer_encode(tparams, x, mask, n_heads=4):
    """x [B, K, d]; mask [B, K] 1=valid. Post-LN, torch-style."""
    B, K, d = x.shape
    hd = d // n_heads
    attn_mask = (mask <= 0)[:, None, None, :]  # [B,1,1,K] True=pad
    for lp in tparams["layers"]:
        qkv = x @ lp["qkv_w"].T + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, K, n_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, K, n_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, K, n_heads, hd).transpose(0, 2, 1, 3)
        logits = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(hd)
        logits = jnp.where(attn_mask, -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, K, d)
        out = out @ lp["out_w"].T + lp["out_b"]
        x = _layer_norm(x + out, lp["ln1_scale"], lp["ln1_bias"])
        ff = jax.nn.relu(x @ lp["ff1_w"].T + lp["ff1_b"]) @ lp["ff2_w"].T + lp["ff2_b"]
        x = _layer_norm(x + ff, lp["ln2_scale"], lp["ln2_bias"])
    return x


def history_encoder(
    params: Params,
    cfg,
    neighbor_hyp: jax.Array,  # [B, K, d] ball
    rel_hyp: jax.Array,  # [B, K, d] ball
    time_hyp: jax.Array,  # [B, K, d] ball
    query_tangent: jax.Array,  # [B, d]
    mask: jax.Array,  # [B, K]
    c,
) -> jax.Array:
    """QCHHE forward (ref :402-472) -> [B, d] ball context."""
    context_t = history_encoder_tangent(
        params, cfg,
        H.log_map_zero(neighbor_hyp, c),
        H.log_map_zero(rel_hyp, c),
        H.log_map_zero(time_hyp, c),
        query_tangent, mask)
    return H.exp_map_zero(context_t, c)


def history_encoder_tangent(
    params: Params,
    cfg,
    nb_t: jax.Array,  # [B, K, d] tangent
    rl_t: jax.Array,  # [B, K, d] tangent
    tm_t: jax.Array,  # [B, K, d] tangent
    query_tangent: jax.Array,  # [B, d]
    mask: jax.Array,  # [B, K]
) -> jax.Array:
    """QCHHE on tangent features -> [B, d] TANGENT context.

    The all-tangent entry point: callers holding tangent features (the
    enrichment path — see :func:`enrich_embeddings`) skip the three
    [B, K, d] exp/log round trips of the ball API, which are identity up
    to ``clamp_tangent_norm`` (the same invariant the uvrgcn
    tangent-carry scan relies on, hyperbolic/model.py:_evolve_tangent).
    """
    feat = jnp.concatenate([nb_t, rl_t, tm_t], axis=-1)  # [B, K, 3d]
    hist = jnp.tanh(feat @ params["hist_proj_w"].T + params["hist_proj_b"])

    bias_in = (query_tangent @ params["cond_in_w"].T + params["cond_in_b"])[:, None]
    bias_gate = jax.nn.sigmoid(
        query_tangent @ params["cond_gate_w"].T + params["cond_gate_b"]
    )[:, None]
    hist = (hist + bias_in) * bias_gate

    if cfg.est_encoder == "gru":
        def step(h, x_t):
            h_new = gru_cell(params["qchhe_gru"], x_t, h)
            return h_new, h_new

        B, K, d = hist.shape
        h0 = jnp.zeros((B, d))
        # unroll the K-event axis: the config-5 GDELT trace showed the
        # epoch dominated by per-iteration [B, d] slice-start DMA chains
        # from this scan (K=32 slices per QCHHE call per step); inlining
        # the short recurrence lets XLA fuse across events
        _, seq = jax.lax.scan(step, h0, hist.transpose(1, 0, 2),
                              unroll=True)
        hist_seq = seq.transpose(1, 0, 2)
    else:
        hist_seq = _transformer_encode(params["qchhe_transformer"], hist, mask)

    hist_seq = _layer_norm(hist_seq, params["out_norm_scale"], params["out_norm_bias"])

    K = hist_seq.shape[1]
    query_exp = jnp.broadcast_to(query_tangent[:, None], hist_seq.shape)
    scores = (
        jnp.concatenate([hist_seq, query_exp], axis=-1) @ params["attn_proj_w"].T
        + params["attn_proj_b"]
    )[..., 0]
    scores = jnp.where(mask <= 0, -1e9, scores)
    attn = jax.nn.softmax(scores, axis=-1) * mask
    attn = attn / jnp.maximum(jnp.sum(attn, axis=-1, keepdims=True), 1e-9)
    return jnp.sum(hist_seq * attn[..., None], axis=1)


# ------------------------------------------------------ enrich + fusion

def fuse_global_local_tangent(params: Params, g_t, l_t):
    """Gated fusion on tangent features -> TANGENT rows (ref :555-577)."""
    gate = jax.nn.sigmoid(
        jnp.concatenate([g_t, l_t], axis=-1) @ params["fusion_gate_w"].T
        + params["fusion_gate_b"]
    )
    return jnp.clip(gate * l_t + (1.0 - gate) * g_t, -CLAMP, CLAMP)


def fuse_global_local(params: Params, h_global, h_local, c):
    """Gated tangent-space fusion (ref:hyperbolic_model.py:555-577)."""
    fused_t = fuse_global_local_tangent(
        params, H.log_map_zero(h_global, c), H.log_map_zero(h_local, c))
    return H.project_to_ball(H.exp_map_zero(fused_t, c), c)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RetrievalBatch:
    """Device-side padded ETNR query results for the batch heads.

    Carries ONLY host-retrieved arrays — the entity/relation tables and
    the slow state are read from the (donated) train state inside the
    jitted step, never passed alongside it (aliasing a donated buffer is
    an XLA error)."""

    nb_ents: jax.Array  # [B, K] int32
    nb_rels: jax.Array  # [B, K] int32
    deltas: jax.Array  # [B, K] f32
    event_mask: jax.Array  # [B, K] f32
    row_mask: jax.Array  # [B] f32 — validity of the batch row itself


def enrich_embeddings(
    params: Params,
    cfg,
    global_emb: jax.Array,  # [N, d] ball
    triples: jax.Array,  # [B, 3]
    rb: RetrievalBatch,
    c,
    slow_state: jax.Array,  # [N, d] H-PES slow buffer
    dynamic_tangent: jax.Array,  # [N, d] tangent entity table for neighbors
    rel_tangent: jax.Array,  # [2R, d] evolved relation embeddings (h_0)
    *,
    rng=None,
    train: bool = False,
    return_ctx_tangent: bool = False,
):
    """EST enrichment of query-entity rows (ref:hyperbolic_model.py:579-648).

    Per-row (not unique-head) formulation: rows sharing a head compute the
    identical context and scatter the identical value; padded rows are
    dropped from the scatter.

    TPU round-5 consolidation: the whole enrichment pipeline runs on
    TANGENT features — the reference's per-stage exp/log round trips
    (neighbor inject, relation lift, Δt projection, fusion) are identity
    up to ``clamp_tangent_norm``, so the [B, K, d] transcendental passes
    and their HBM traffic collapse into cheap norm clamps (the config-5
    trace's per-event DMA chains, docs/BENCHMARKS.md).

    ``return_ctx_tangent=True`` additionally returns the fused TANGENT
    rows [B, d] so the H-PES writeback can skip re-gathering +
    re-log-mapping the enriched table (hyperbolic/train.py).
    """
    heads = triples[:, 0]
    B, K = rb.nb_ents.shape
    d = cfg.h_dim

    # neighbor features: log(inject_slow(exp(dyn_tan))) in pure tangent
    nb_flat = rb.nb_ents.reshape(-1)
    nb_t = H.clamp_tangent_norm(dynamic_tangent[nb_flat], c)
    nb_t = jnp.clip(nb_t + jax.lax.stop_gradient(slow_state)[nb_flat],
                    -CLAMP, CLAMP)
    nb_t = H.clamp_tangent_norm(nb_t, c).reshape(B, K, d)

    rl_t = H.clamp_tangent_norm(
        rel_tangent[rb.nb_rels.reshape(-1)], c).reshape(B, K, d)
    tm_t = H.clamp_tangent_norm(time_delta_tangent(params, rb.deltas), c)

    q_tangent = H.log_map_zero(global_emb[heads], c)
    context_t = history_encoder_tangent(
        params, cfg, nb_t, rl_t, tm_t, q_tangent, rb.event_mask)
    fused_t = fuse_global_local_tangent(
        params, q_tangent, H.clamp_tangent_norm(context_t, c))
    fused = H.project_to_ball(H.exp_map_zero(fused_t, c), c).astype(
        global_emb.dtype)  # dtype-preserving under bf16 compute

    # scatter enriched rows back; padded rows are dropped
    n = global_emb.shape[0]
    safe_heads = jnp.where(rb.row_mask > 0, heads, n)  # out-of-range => drop
    out = global_emb.at[safe_heads].set(fused, mode="drop")
    if return_ctx_tangent:
        return out, H.clamp_tangent_norm(fused_t, c)
    return out


# ------------------------------------------------------------------ TANS

def build_true_tails_dict(snapshot_list: List[np.ndarray], num_rels: int):
    """(head, rel) -> unique true-tail array (ref:est_components.py:479-510)."""
    true_tails: Dict[Tuple[int, int], set] = {}
    for snapshot in snapshot_list:
        if snapshot is None or len(snapshot) == 0:
            continue
        for h, r, t in np.asarray(snapshot)[:, :3]:
            true_tails.setdefault((int(h), int(r)), set()).add(int(t))
            true_tails.setdefault((int(t), int(r) + num_rels), set()).add(int(h))
    return {k: np.asarray(sorted(v), dtype=np.int64) for k, v in true_tails.items()}


def tans_mask_coo(
    triples: np.ndarray,  # [B, 3] padded
    mask: np.ndarray,  # [B]
    true_tails_by_hr: dict,
    max_filter: int = 50,
    pad_bucket: int = 4096,
):
    """Padded COO (rows, cols) of score entries to squash to -1e9
    (ref:est_components.py:513-555, one vectorised scatter instead of a
    per-row Python loop). Padding entries carry an out-of-range row so a
    ``mode="drop"`` scatter ignores them; the length is bucketed to keep
    jit shapes stable.
    """
    B = len(triples)
    rows, cols = [], []
    for i in range(B):
        if mask[i] <= 0:
            continue
        h, r, t = int(triples[i][0]), int(triples[i][1]), int(triples[i][2])
        tails = true_tails_by_hr.get((h, r))
        if tails is None:
            continue
        tails = tails[tails != t][:max_filter]
        if len(tails):
            rows.append(np.full(len(tails), i, dtype=np.int64))
            cols.append(tails)
    n = sum(len(r) for r in rows)
    padded = max(((n + pad_bucket - 1) // pad_bucket) * pad_bucket, pad_bucket)
    out_rows = np.full(padded, B, dtype=np.int64)  # out-of-range => dropped
    out_cols = np.zeros(padded, dtype=np.int64)
    if n:
        out_rows[:n] = np.concatenate(rows)
        out_cols[:n] = np.concatenate(cols)
    return out_rows, out_cols
