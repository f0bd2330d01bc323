"""Whole-epoch fused training: one XLA program per epoch.

The reference dispatches one Python-side training step per snapshot
(ref:src/main.py:223-246) — on TPU (especially through a remote tunnel)
per-step dispatch latency dominates for ICEWS-sized snapshots. Here the
entire dataset of padded snapshots lives in HBM as a ``SnapshotStore``
and an epoch is ONE jitted ``lax.scan`` over a shuffled index vector:
each scan iteration slices its history window out of the store with
``dynamic_slice``, recomputes degree norms on-device, takes gradients
and applies the optimizer — exactly one optimizer step per snapshot,
matching the reference's SGD granularity.

Snapshots whose history window would be shorter than ``history_len``
(the first few indices) are handled by the caller through the per-step
path; the scan covers all full-window indices.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.config import ModelConfig, TrainConfig
from regcn_tpu.data.snapshots import Snapshot, _round_up, build_snapshot, pad_triples
from regcn_tpu.models import recurrent
from regcn_tpu.train.state import TrainState, make_optimizer
from regcn_tpu.utils.dtypes import tree_to_compute, tree_to_fp32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SnapshotStore:
    """All snapshots of a split, uniformly padded, device-resident.

    Degree norms are stored ([S, N], a few MB at ICEWS scale) unless the
    split is large enough that O(S * N) memory matters, in which case
    they are recomputed on device per step (``in_deg_norm is None``).
    """

    src: jax.Array  # [S, E]
    dst: jax.Array  # [S, E]
    rel: jax.Array  # [S, E]
    edge_mask: jax.Array  # [S, E]
    rc_rel: jax.Array  # [S, M]
    rc_ent: jax.Array  # [S, M]
    rc_mask: jax.Array  # [S, M]
    triples: jax.Array  # [S, B, 3] with inverses
    triple_mask: jax.Array  # [S, B]
    num_nodes: int = dataclasses.field(metadata={"static": True})
    in_deg_norm: object = None  # [S, N] or None
    has_in_edge: object = None  # [S, N] or None
    # stacked boundary-halo partitions (parallel.halo.HaloPartitionedEdges
    # with leading [S] axes) when built with halo_shards; None otherwise
    halo: object = None
    # True when every snapshot's edges are destination-sorted (see
    # Snapshot.dst_sorted) — window_snapshot propagates it so the Pallas
    # scatter skips its in-step argsort
    dst_sorted: bool = dataclasses.field(metadata={"static": True},
                                         default=False)


def build_snapshot_store(
    snap_list: List[np.ndarray],
    num_nodes: int,
    num_rels: int,
    edge_bucket: int = 1024,
    rc_bucket: int = 1024,
    triple_bucket: int = 512,
    pad_front: int = 0,
    store_norms: bool | None = None,
    halo_shards: int | None = None,
    halo_bucket: int = 64,
    rc_mode: str = "both",
) -> SnapshotStore:
    """``pad_front`` prepends that many EMPTY snapshots (all masks zero).

    The evolution step treats an empty snapshot as an identity carry, so
    front padding lets every history window have the same static length:
    the window for target snapshot ``i`` is always
    ``store[i - hlen + pad_front : i + pad_front)`` — short-history
    prefixes need no separate per-step dispatch path.

    ``store_norms`` precomputes per-snapshot degree norms into the store
    ([S, N] x2) instead of recomputing them with device scatters in every
    scan step; auto-enabled while the cost stays under ~128 MB.

    ``halo_shards`` additionally attaches stacked boundary-halo edge
    partitions (:func:`regcn_tpu.parallel.halo.build_halo_store`) for
    shard_map aggregation over a ``graph``-axis mesh of that size.
    """
    E = _round_up(max(2 * len(t) for t in snap_list), edge_bucket)
    M = _round_up(max(4 * len(t) for t in snap_list), rc_bucket)
    B = _round_up(max(2 * len(t) for t in snap_list), triple_bucket)
    S = pad_front + len(snap_list)
    if store_norms is None:
        store_norms = S * num_nodes * 8 <= 128 * 1024 * 1024
    fields = {k: [] for k in ("src", "dst", "rel", "edge_mask", "rc_rel", "rc_ent", "rc_mask")}
    trips, tmasks = [], []
    norms, has_ins = [], []
    empty = np.zeros((0, 3), np.int64)
    for t in [empty] * pad_front + list(snap_list):
        if len(t) == 0:
            for k in fields:
                dtype = np.float32 if "mask" in k else np.int32
                size = M if k.startswith("rc_") else E
                fields[k].append(np.zeros((size,), dtype))
            trips.append(np.zeros((B, 3), np.int32))
            tmasks.append(np.zeros((B,), np.float32))
            norms.append(np.ones((num_nodes,), np.float32))
            has_ins.append(np.zeros((num_nodes,), np.float32))
            continue
        sn = build_snapshot(t, num_nodes, num_rels, edge_pad=E, rc_pad=M,
                            rc_mode=rc_mode)
        for k in fields:
            fields[k].append(getattr(sn, k))
        tt, tm = pad_triples(t, num_rels, bucket=B)
        trips.append(tt)
        tmasks.append(tm)
        norms.append(sn.in_deg_norm)
        has_ins.append(sn.has_in_edge)
    halo = None
    if halo_shards is not None and halo_shards > 0:
        from regcn_tpu.parallel.halo import build_halo_store

        halo, _ = build_halo_store(
            list(snap_list), num_nodes, num_rels, halo_shards,
            pad_front=pad_front, edge_bucket=edge_bucket,
            halo_bucket=halo_bucket,
        )
    return SnapshotStore(
        **{k: jnp.asarray(np.stack(v)) for k, v in fields.items()},
        triples=jnp.asarray(np.stack(trips)),
        triple_mask=jnp.asarray(np.stack(tmasks)),
        num_nodes=num_nodes,
        in_deg_norm=jnp.asarray(np.stack(norms)) if store_norms else None,
        has_in_edge=jnp.asarray(np.stack(has_ins)) if store_norms else None,
        halo=halo,
        dst_sorted=True,
    )


def window_snapshot(store: SnapshotStore, start: jax.Array, hlen: int) -> Snapshot:
    """Slice a [T, ...] history window out of the store; degree norms
    come precomputed from the store when present, else from per-step
    device scatters."""

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, start, hlen, axis=0)

    src, dst, rel = sl(store.src), sl(store.dst), sl(store.rel)
    emask = sl(store.edge_mask)
    if store.in_deg_norm is not None:
        in_deg_norm = sl(store.in_deg_norm)
        has_in_edge = sl(store.has_in_edge)
    else:
        in_deg = jax.vmap(
            lambda d, m: jax.ops.segment_sum(m, d, num_segments=store.num_nodes)
        )(dst, emask)
        in_deg_norm = 1.0 / jnp.maximum(in_deg, 1.0)
        has_in_edge = (in_deg > 0).astype(jnp.float32)
    halo = None
    if store.halo is not None:
        # slice every array field of the stacked halo partition; static
        # fields (rows_per_shard, halo_per_pair) carry over untouched
        halo = jax.tree.map(sl, store.halo)
    return Snapshot(
        src=src, dst=dst, rel=rel, edge_mask=emask,
        in_deg_norm=in_deg_norm,
        has_in_edge=has_in_edge,
        rc_rel=sl(store.rc_rel), rc_ent=sl(store.rc_ent), rc_mask=sl(store.rc_mask),
        num_edges=int(store.src.shape[1]),
        num_triples=int(store.triples.shape[1]),
        halo=halo,
        dst_sorted=store.dst_sorted,
    )


def make_epoch_fn(
    cfg: ModelConfig,
    tc: TrainConfig,
    static_snap=None,
    impl: str = "xla",
    pad_front: int = 0,
):
    """Returns jitted ``epoch_fn(state, store, order) -> (state, losses)``.

    ``order``: [K] int32 of snapshot indices in the ORIGINAL (unpadded)
    list. With ``pad_front=0`` each must be >= history_len; with
    ``pad_front=hlen`` every index >= 1 is valid (short windows are
    front-padded with empty identity snapshots).
    """
    opt = make_optimizer(tc)
    hlen = tc.train_history_len
    cdt = jnp.dtype(cfg.dtype)

    def loss_fn(params, model_state, history, triples, mask, rng):
        params = tree_to_compute(params, cdt)
        history = tree_to_compute(history, cdt)
        _, losses, new_state = recurrent.get_loss(
            params, model_state, cfg, history, triples, mask,
            static_snap=static_snap, rng=rng, train=True, impl=impl,
        )
        total = (
            tc.task_weight * losses["entity"]
            + (1.0 - tc.task_weight) * losses["relation"]
            + losses["static"]
        )
        return total, (losses, new_state)

    def epoch_fn(state: TrainState, store: SnapshotStore, order: jax.Array):
        def body(st: TrainState, i):
            history = window_snapshot(store, i - hlen + pad_front, hlen)
            triples = store.triples[i + pad_front]
            mask = store.triple_mask[i + pad_front]
            rng, step_rng = jax.random.split(st.rng)
            grads, (losses, new_model_state) = jax.grad(loss_fn, has_aux=True)(
                st.params, st.model_state, history, triples, mask, step_rng
            )
            if cdt != jnp.float32:
                grads = tree_to_fp32(grads)
                losses = tree_to_fp32(losses)
            updates, new_opt_state = opt.update(grads, st.opt_state, st.params)
            new_params = jax.tree.map(lambda p, u: p + u, st.params, updates)
            new_st = TrainState(
                params=new_params, opt_state=new_opt_state,
                model_state=new_model_state, rng=rng, step=st.step + 1,
            )
            return new_st, losses

        return jax.lax.scan(body, state, order)

    return jax.jit(epoch_fn, donate_argnums=(0,))


def make_eval_fn(predict_fn, hlen: int):
    """Fused rolling-window evaluation: ONE compiled scan for a whole
    eval split (the reference dispatches one step per snapshot,
    ref:src/main.py:67-101 — through a remote TPU tunnel that latency
    dominates eval wall-clock).

    The eval store holds [last-hlen history snapshots ... eval snapshots]
    (front-padded with empty identity snapshots if the history is
    shorter), so the ground-truth rolling window for eval step t is the
    static slice ``store[t : t + hlen)`` — no data dependence on model
    output, hence scannable.

    ``predict_fn(state, history, triples, mask) -> (scores_ob, scores_rel)``.
    Returns ``eval_fn(state, store, ent_rows, ent_cols, rel_rows, rel_cols)
    -> 4 x [T, B] rank arrays`` (raw/filtered entity, raw/filtered
    relation); filter COOs are [T, F] padded with out-of-range rows.
    """
    from regcn_tpu.train import metrics

    def eval_fn(state, store: SnapshotStore, ent_rows, ent_cols, rel_rows, rel_cols):
        n_eval = ent_rows.shape[0]

        def body(_, inputs):
            t, er, ec, rr, rc = inputs
            history = window_snapshot(store, t, hlen)
            triples = store.triples[t + hlen]
            mask = store.triple_mask[t + hlen]
            s_ob, s_rel = predict_fn(state, history, triples, mask)
            return 0, (
                metrics.device_ranks(s_ob, triples[:, 2]),
                metrics.device_filtered_ranks(s_ob, triples[:, 2], er, ec),
                metrics.device_ranks(s_rel, triples[:, 1]),
                metrics.device_filtered_ranks(s_rel, triples[:, 1], rr, rc),
            )

        ts = jnp.arange(n_eval, dtype=jnp.int32)
        _, ranks = jax.lax.scan(body, 0, (ts, ent_rows, ent_cols, rel_rows, rel_cols))
        return ranks

    return jax.jit(eval_fn)


def build_eval_store(
    history_list: List[np.ndarray],
    eval_list: List[np.ndarray],
    num_nodes: int,
    num_rels: int,
    hlen: int,
    edge_bucket: int = 1024,
    rc_bucket: int = 1024,
    triple_bucket: int = 512,
    halo_shards: int | None = None,
    rc_mode: str = "both",
) -> SnapshotStore:
    """Store for :func:`make_eval_fn`: last-hlen history + eval snapshots,
    front-padded with empty snapshots when history is shorter than hlen."""
    tail = list(history_list[-hlen:])
    return build_snapshot_store(
        tail + list(eval_list), num_nodes, num_rels,
        edge_bucket=edge_bucket, rc_bucket=rc_bucket,
        triple_bucket=triple_bucket, pad_front=hlen - len(tail),
        halo_shards=halo_shards, rc_mode=rc_mode,
    )


def stack_eval_filters(filters, eval_list, num_rels, triple_bucket,
                       rel_mode: bool):
    """[T, F] padded filter COOs aligned with the eval store's triples.

    ``filters[t]`` is the AnswerFilter for eval snapshot t (or None);
    query keys/targets replicate the device-side triple layout
    (pad_triples: originals then inverses, zero-padded)."""
    from regcn_tpu.data.snapshots import pad_triples
    from regcn_tpu.train.metrics import filter_coo_padded

    rows_list, cols_list = [], []
    for t, snap in enumerate(eval_list):
        triples, _ = pad_triples(snap, num_rels, triple_bucket)
        if rel_mode:
            keys, tgt = triples[:, [0, 2]], triples[:, 1]
        else:
            keys, tgt = triples[:, [0, 1]], triples[:, 2]
        f = filters[t] if filters is not None else None
        r, c = filter_coo_padded(f, keys, tgt)
        rows_list.append(r)
        cols_list.append(c)
    F = max(len(r) for r in rows_list)
    B = len(triples)
    rows = np.full((len(eval_list), F), B, np.int64)
    cols = np.zeros((len(eval_list), F), np.int64)
    for t, (r, c) in enumerate(zip(rows_list, cols_list)):
        rows[t, : len(r)] = r
        cols[t, : len(c)] = c
    return jnp.asarray(rows), jnp.asarray(cols)
