"""HisRES training driver (parity with ref:hisres_src/hisres_main.py).

Builds per-snapshot + 2-snapshot-union graph streams (ref :303-313),
queries the sparse history store for one-hot vocabularies and
query-conditioned history graphs (ref :317-353), and runs the jitted
train/predict steps with deterministic seeding (ref seed_torch :25-32 —
here the seed flows through jax.random keys).
"""

from __future__ import annotations

import dataclasses
import logging
import random
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regcn_tpu.config import TrainConfig
from regcn_tpu.data.answers import build_answer_filters_by_time
from regcn_tpu.utils.dtypes import tree_to_compute, tree_to_fp32
from regcn_tpu.data.dataset import TKGData
from regcn_tpu.data.snapshots import build_history, build_snapshot, pad_triples, split_by_time
from regcn_tpu.hisres import model as hmodel
from regcn_tpu.hisres.history import HistoryStore
from regcn_tpu.hisres.model import HisResConfig, HisResState
from regcn_tpu.train import metrics
from regcn_tpu.train.state import make_optimizer

log = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HisResTrainState:
    params: Dict
    opt_state: object
    model_state: HisResState
    rng: jax.Array
    step: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HisResStore:
    """Per-target hisres step inputs for a whole split, device-resident.

    Everything here depends only on the dataset (query triples, the
    query-conditioned history graphs from the sparse tail history, and
    the windowed relation vocabularies), so it is precomputed once and
    the epoch/eval run as single fused scans instead of one dispatch per
    snapshot (the reference queries its sparse matrices per step,
    ref:hisres_main.py:317-353)."""

    raw: jax.Array  # [S, B, 3]
    inv: jax.Array  # [S, B, 3]
    mask: jax.Array  # [S, B]
    hg_raw: object  # Snapshot with stacked [S, ...] fields
    hg_inv: object
    vocab_rows: jax.Array  # [S, V] int32; row == 2B means dropped
    vocab_rels: jax.Array  # [S, V] int32


def union_snapshots(input_list: List[np.ndarray]) -> List[np.ndarray]:
    """2-snapshot union stream (ref main :307-313); single-snapshot
    windows reuse the snapshot itself (ref :308-309)."""
    if len(input_list) <= 1:
        return list(input_list)
    return [
        np.unique(np.concatenate([input_list[i], input_list[i + 1]]), axis=0)
        for i in range(len(input_list) - 1)
    ]


class HisResTrainer:
    def __init__(self, cfg: HisResConfig, tc: TrainConfig, data: TKGData,
                 his_edge_bucket: int = 4096, his_max_edges: Optional[int] = 65536,
                 mesh=None, dist_agg: str = "gspmd",
                 rel_window_mode: str = "full",
                 run_analysis: bool = False):
        if dist_agg not in ("gspmd", "halo"):
            raise ValueError(f"dist_agg must be 'gspmd' or 'halo', got {dist_agg!r}")
        if dist_agg == "halo":
            if mesh is None:
                raise ValueError("dist_agg='halo' requires a mesh")
            # boundary-halo shard_map aggregation for BOTH recurrent
            # streams (per-snapshot + union-graph); the candidate cells
            # stay on the dense path (see HisResConfig.impl)
            import dataclasses as _dc

            from regcn_tpu.dist import HaloImpl

            cfg = _dc.replace(cfg, impl=HaloImpl(mesh))
        self.cfg = cfg
        self.tc = tc
        self.data = data
        # optional jax.sharding.Mesh: entity tables/moments row-sharded
        # over the graph axis (GSPMD), same rules as parallel/sharding.py
        self.mesh = mesh
        self.dist_agg = dist_agg
        if mesh is not None:
            from regcn_tpu.parallel.mesh import check_entity_divisibility

            check_entity_divisibility(cfg.num_ents, mesh)
        self.num_rels = data.num_rels
        self.num_nodes = data.num_nodes
        # --run-analysis: per-epoch gradient/embedding stats during fit()
        # (ref:hisres_main.py:255 analysis mode, per-epoch here because
        # the fused epoch precludes mid-epoch host logging)
        self.run_analysis = run_analysis
        self._analysis_grad = None
        self.his_edge_bucket = his_edge_bucket
        self.his_max_edges = his_max_edges
        self.train_list = split_by_time(data.train)
        self.valid_list = split_by_time(data.valid)
        self.test_list = split_by_time(data.test)
        self.all_list = self.train_list + self.valid_list + self.test_list

        self.static_snap = None
        if cfg.use_static and data.static_triples is not None:
            n_total = data.num_nodes + data.num_words
            self.static_snap = build_snapshot(
                data.static_triples, n_total, data.num_static_rels,
                edge_bucket=tc.edge_bucket,
            )

        # sparse history over ALL splits (the reference's offline tool uses
        # train+valid+test, ref:get_new_history.py:86)
        self.history_store = HistoryStore(
            self.num_nodes, self.num_rels, history_len=tc.train_history_len,
            rel_window_mode=rel_window_mode,
        ).build(self.all_list)

        self.opt = make_optimizer(tc)
        self._history_cache: Dict = {}
        self._g_store = None
        self._gg_store = None
        self._his_store = None
        self._eval_cache: Dict = {}
        self._build_steps()

    def _build_steps(self):
        cfg, tc, opt = self.cfg, self.tc, self.opt
        cdt = jnp.dtype(cfg.compute_dtype)
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from regcn_tpu.parallel.mesh import GRAPH_AXIS

            _ent_rows = NamedSharding(mesh, P(GRAPH_AXIS, None))

        def constrain_entities(params):
            """Keep the entity table row-sharded across scan steps
            (no-op without a mesh); same rules as parallel/sharding.py."""
            if mesh is None:
                return params
            params = dict(params)
            params["dynamic_emb"] = jax.lax.with_sharding_constraint(
                params["dynamic_emb"], _ent_rows)
            return params

        def loss_fn(params, model_state, history, history_gg, triples, inv_triples,
                    mask, hg_raw, hg_inv, rel_vocab, rng):
            params = tree_to_compute(params, cdt)
            history = tree_to_compute(history, cdt)
            history_gg = tree_to_compute(history_gg, cdt)
            _, losses, new_state = hmodel.get_loss(
                params, model_state, cfg, history, history_gg, triples,
                inv_triples, mask, hg_raw, hg_inv, rel_vocab,
                static_snap=self.static_snap, rng=rng, train=True,
            )
            total = (tc.task_weight * losses["entity"]
                     + (1 - tc.task_weight) * losses["relation"]
                     + losses["static"])
            return total, (losses, new_state)

        def train_step(state, history, history_gg, triples, inv_triples, mask,
                       hg_raw, hg_inv, rel_vocab):
            rng, step_rng = jax.random.split(state.rng)
            grads, (losses, new_model_state) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.model_state, history, history_gg, triples,
                inv_triples, mask, hg_raw, hg_inv, rel_vocab, step_rng,
            )
            if cdt != jnp.float32:
                grads = tree_to_fp32(grads)
                losses = tree_to_fp32(losses)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = constrain_entities(optax.apply_updates(state.params, updates))
            return (
                HisResTrainState(params=new_params, opt_state=new_opt,
                                 model_state=new_model_state, rng=rng,
                                 step=state.step + 1),
                losses,
            )

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self._loss_fn = loss_fn  # exposed for --run-analysis grad stats

        def predict_step(state, history, history_gg, triples, inv_triples, mask,
                         hg_raw, hg_inv, rel_vocab):
            return hmodel.predict(
                state.params, state.model_state, cfg, history, history_gg,
                triples, inv_triples, mask, hg_raw, hg_inv, rel_vocab,
                static_snap=self.static_snap,
            )

        self.predict_step = jax.jit(predict_step)

        def rank_step(state, history, history_gg, triples, inv_triples, mask,
                      hg_raw, hg_inv, rel_vocab, ent_rows, ent_cols,
                      rel_rows, rel_cols):
            """On-device raw+filtered ranks over the stacked [2B] queries."""
            s_ent, s_rel = predict_step(state, history, history_gg, triples,
                                        inv_triples, mask, hg_raw, hg_inv, rel_vocab)
            allq = jnp.concatenate([triples, inv_triples])
            return (
                metrics.device_ranks(s_ent, allq[:, 2]),
                metrics.device_filtered_ranks(s_ent, allq[:, 2], ent_rows, ent_cols),
                metrics.device_ranks(s_rel, allq[:, 1]),
                metrics.device_filtered_ranks(s_rel, allq[:, 1], rel_rows, rel_cols),
            )

        self.rank_step = jax.jit(rank_step)

        # fused whole-epoch / whole-split scans; window targets i >= hlen
        # run fused, the short-history prefix (i < hlen) per-step
        from regcn_tpu.train.epoch import window_snapshot

        hlen = tc.train_history_len

        def _step_inputs(g_store, gg_store, his: HisResStore, i):
            history = window_snapshot(g_store, i, hlen)
            if hlen > 1:
                history_gg = window_snapshot(gg_store, i - hlen, hlen - 1)
            else:
                history_gg = history  # len-1 window: gg stream == g stream
            raw, inv, mask = his.raw[i], his.inv[i], his.mask[i]
            hg_r = jax.tree.map(lambda a: a[i], his.hg_raw)
            hg_i = jax.tree.map(lambda a: a[i], his.hg_inv)
            B2 = 2 * raw.shape[0]
            vocab = jnp.zeros((B2, 2 * self.num_rels), jnp.float32)
            vocab = vocab.at[his.vocab_rows[i], his.vocab_rels[i]].set(1.0, mode="drop")
            return history, history_gg, raw, inv, mask, hg_r, hg_i, vocab

        def epoch_fn(state, g_store, gg_store, his: HisResStore, order):
            def body(st, i):
                return train_step(st, *_step_inputs(g_store, gg_store, his, i))

            return jax.lax.scan(body, state, order)

        self.epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))

        ehlen = tc.test_history_len

        def eval_fn(state, g_store, gg_store, his: HisResStore,
                    ent_rows, ent_cols, rel_rows, rel_cols):
            def body(_, inputs):
                t, er, ec, rr, rc = inputs
                history = window_snapshot(g_store, t, ehlen)
                if ehlen > 1:
                    history_gg = window_snapshot(gg_store, t, ehlen - 1)
                else:
                    history_gg = history
                raw, inv, mask = his.raw[t], his.inv[t], his.mask[t]
                hg_r = jax.tree.map(lambda a: a[t], his.hg_raw)
                hg_i = jax.tree.map(lambda a: a[t], his.hg_inv)
                B2 = 2 * raw.shape[0]
                vocab = jnp.zeros((B2, 2 * self.num_rels), jnp.float32)
                vocab = vocab.at[his.vocab_rows[t], his.vocab_rels[t]].set(
                    1.0, mode="drop")
                s_ent, s_rel = predict_step(state, history, history_gg, raw,
                                            inv, mask, hg_r, hg_i, vocab)
                allq = jnp.concatenate([raw, inv])
                return 0, (
                    metrics.device_ranks(s_ent, allq[:, 2]),
                    metrics.device_filtered_ranks(s_ent, allq[:, 2], er, ec),
                    metrics.device_ranks(s_rel, allq[:, 1]),
                    metrics.device_filtered_ranks(s_rel, allq[:, 1], rr, rc),
                )

            ts = jnp.arange(ent_rows.shape[0], dtype=jnp.int32)
            _, ranks = jax.lax.scan(
                body, 0, (ts, ent_rows, ent_cols, rel_rows, rel_cols))
            return ranks

        self.eval_fn = jax.jit(eval_fn)

    # ------------------------------------------------------- fused stores
    def _build_his_store(self, snap_list, times) -> HisResStore:
        """Stack per-target step inputs [S, ...] with uniform padding."""
        from regcn_tpu.data.snapshots import Snapshot, _round_up

        tc = self.tc
        S = len(snap_list)
        B = _round_up(max(max(len(s) for s in snap_list), 1), tc.triple_bucket)
        raws = np.zeros((S, B, 3), np.int32)
        invs = np.zeros((S, B, 3), np.int32)
        masks = np.zeros((S, B), np.float32)
        graphs_raw, graphs_inv = [], []
        vrows, vrels = [], []
        # common his-graph edge pad: size pass first
        max_e = 1
        pairs_cache = []
        for t, snap in enumerate(snap_list):
            arr = np.asarray(snap)[:, :3].astype(np.int32)
            rows, _ = self.history_store._tail_pairs(arr, times[t])
            e = 2 * len(rows)
            if self.his_max_edges is not None:
                e = min(e, self.his_max_edges)
            max_e = max(max_e, e)
        edge_pad = _round_up(max_e, self.his_edge_bucket)
        for t, snap in enumerate(snap_list):
            arr = np.asarray(snap)[:, :3].astype(np.int32)
            b = len(arr)
            raws[t, :b] = arr
            masks[t, :b] = 1.0
            # identical layout to _batch (padded inv rows keep rel=R; they
            # are masked everywhere they are consumed)
            inv = raws[t][:, [2, 1, 0]].copy()
            inv[:, 1] += self.num_rels
            invs[t] = inv
            graphs_raw.append(self.history_store.his_graph(
                raws[t], masks[t], times[t], inv=False,
                edge_pad=edge_pad, max_edges=self.his_max_edges))
            graphs_inv.append(self.history_store.his_graph(
                invs[t], masks[t], times[t], inv=True,
                edge_pad=edge_pad, max_edges=self.his_max_edges))
            allq = np.concatenate([raws[t], invs[t]])
            allm = np.concatenate([masks[t], masks[t]])
            r, c = self.history_store.rel_pairs(allq, times[t])
            keep = allm[r] > 0
            vrows.append(r[keep].astype(np.int32))
            vrels.append(c[keep].astype(np.int32))
        V = _round_up(max(max(len(r) for r in vrows), 1), 512)
        vocab_rows = np.full((S, V), 2 * B, np.int32)  # out-of-range => drop
        vocab_rels = np.zeros((S, V), np.int32)
        for t, (r, c) in enumerate(zip(vrows, vrels)):
            vocab_rows[t, : len(r)] = r
            vocab_rels[t, : len(c)] = c

        def stack(graphs):
            fields = {
                k: jnp.asarray(np.stack([getattr(g, k) for g in graphs]))
                for k in ("src", "dst", "rel", "edge_mask", "in_deg_norm",
                          "has_in_edge", "rc_rel", "rc_ent", "rc_mask")
            }
            return Snapshot(**fields, num_edges=edge_pad, num_triples=B)

        return HisResStore(
            raw=jnp.asarray(raws), inv=jnp.asarray(invs), mask=jnp.asarray(masks),
            hg_raw=stack(graphs_raw), hg_inv=stack(graphs_inv),
            vocab_rows=jnp.asarray(vocab_rows), vocab_rels=jnp.asarray(vocab_rels),
        )

    def _build_train_stores(self):
        from regcn_tpu.train.epoch import build_snapshot_store

        tc = self.tc
        hlen = tc.train_history_len
        self._g_store = build_snapshot_store(
            self.train_list, self.num_nodes, self.num_rels,
            edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
            triple_bucket=tc.triple_bucket, pad_front=hlen,
            halo_shards=self._halo_shards(), rc_mode=self.cfg.rc_mode,
        )
        if hlen > 1:
            gg_full = union_snapshots(self.train_list)
            self._gg_store = build_snapshot_store(
                gg_full, self.num_nodes, self.num_rels,
                edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
                triple_bucket=tc.triple_bucket, pad_front=0,
                halo_shards=self._halo_shards(), rc_mode=self.cfg.rc_mode,
            )
        else:
            self._gg_store = self._g_store
        self._his_store = self._build_his_store(
            self.train_list, times=list(range(len(self.train_list))))
        if self.mesh is not None:
            from regcn_tpu.parallel.sharding import shard_snapshot_store

            self._g_store = shard_snapshot_store(self._g_store, self.mesh)
            if self._gg_store is not self._g_store:
                self._gg_store = shard_snapshot_store(self._gg_store, self.mesh)

    def init_state(self, rng: jax.Array) -> HisResTrainState:
        params, model_state = hmodel.init_params(rng, self.cfg)
        state = HisResTrainState(
            params=params, opt_state=self.opt.init(params),
            model_state=model_state, rng=jax.random.fold_in(rng, 7),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            from regcn_tpu.parallel.sharding import param_sharding_rules

            state = jax.device_put(
                state, param_sharding_rules(state, self.mesh))
        return state

    # ------------------------------------------------------------------ data
    def _halo_shards(self):
        from regcn_tpu.dist import halo_shards

        return halo_shards(self.mesh, self.dist_agg)

    def _history(self, snaps, key=None):
        cache_key = ("h",) + key if key is not None else None
        if cache_key and cache_key in self._history_cache:
            return self._history_cache[cache_key]
        h = build_history(list(snaps), self.num_nodes, self.num_rels,
                          edge_bucket=self.tc.edge_bucket,
                          rc_bucket=self.tc.rc_bucket,
                          rc_mode=self.cfg.rc_mode)
        G = self._halo_shards()
        if G:
            from regcn_tpu.dist import attach_history_halo

            h = attach_history_halo(h, snaps, self.num_nodes, self.num_rels,
                                    G, edge_bucket=self.tc.edge_bucket)
        if cache_key:
            self._history_cache[cache_key] = h
        return h

    def _batch(self, snap: np.ndarray, t_global: int):
        """Everything the step needs for one snapshot at global time t."""
        tc = self.tc
        from regcn_tpu.data.snapshots import _round_up

        arr = np.asarray(snap)[:, :3].astype(np.int32)
        b = len(arr)
        B = _round_up(b, tc.triple_bucket)
        raw = np.zeros((B, 3), np.int32)
        raw[:b] = arr
        raw_mask = np.zeros((B,), np.float32)
        raw_mask[:b] = 1.0
        inv = raw[:, [2, 1, 0]].copy()
        inv[:, 1] += self.num_rels
        hg_raw = self.history_store.his_graph(
            raw, raw_mask, t_global, inv=False,
            edge_bucket=self.his_edge_bucket, max_edges=self.his_max_edges)
        hg_inv = self.history_store.his_graph(
            inv, raw_mask, t_global, inv=True,
            edge_bucket=self.his_edge_bucket, max_edges=self.his_max_edges)
        all_rows = np.concatenate([raw, inv])
        rel_vocab = self.history_store.rel_vocab(all_rows, t_global)
        return (jnp.asarray(raw), jnp.asarray(inv), jnp.asarray(raw_mask),
                hg_raw, hg_inv, jnp.asarray(rel_vocab))

    # ----------------------------------------------------------------- train
    def run_epoch(self, state, epoch: int, fused: bool = True):
        tc = self.tc
        hlen = tc.train_history_len
        idx = list(range(1, len(self.train_list)))
        random.Random(tc.seed + epoch).shuffle(idx)
        sums = {"entity": 0.0, "relation": 0.0, "static": 0.0}
        n = 0
        prefix = [i for i in idx if i < hlen] if fused else idx
        full = [i for i in idx if i >= hlen] if fused else []
        for i in prefix:
            lo = max(0, i - hlen)
            window = self.train_list[lo:i]
            history = self._history(window, key=(lo, i))
            history_gg = self._history(union_snapshots(window), key=(lo, i, "gg"))
            raw, inv, mask, hg_raw, hg_inv, rel_vocab = self._batch(self.train_list[i], i)
            state, losses = self.train_step(
                state, history, history_gg, raw, inv, mask, hg_raw, hg_inv, rel_vocab)
            for k in sums:
                sums[k] += float(losses[k])
            n += 1
        if full:
            if self._his_store is None:
                self._build_train_stores()
            state, loss_stack = self.epoch_fn(
                state, self._g_store, self._gg_store, self._his_store,
                jnp.asarray(np.asarray(full, np.int32)))
            loss_host = jax.device_get(loss_stack)
            for k in sums:
                sums[k] += float(np.sum(loss_host[k]))
            n += len(full)
        return state, {k: v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------ eval
    def evaluate_fused(self, state, history_list, eval_list, ent_filters=None,
                       rel_filters=None, time_offset: int = 0, cache_key=None):
        """Whole-split rolling evaluation as ONE device call."""
        from regcn_tpu.data.snapshots import _round_up
        from regcn_tpu.train.epoch import build_eval_store, build_snapshot_store

        tc = self.tc
        hlen = tc.test_history_len
        if cache_key is not None and cache_key in self._eval_cache:
            (g_store, gg_store, his, er, ec, rr, rc, allm) = self._eval_cache[cache_key]
        else:
            g_store = build_eval_store(
                history_list, eval_list, self.num_nodes, self.num_rels, hlen,
                edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
                triple_bucket=tc.triple_bucket,
                halo_shards=self._halo_shards(), rc_mode=self.cfg.rc_mode,
            )
            if hlen > 1:
                tail = list(history_list[-hlen:])
                empty = np.zeros((0, 3), np.int64)
                seq = [empty] * (hlen - len(tail)) + tail + list(eval_list)
                gg_seq = [
                    np.unique(np.concatenate([seq[j], seq[j + 1]]), axis=0)
                    for j in range(len(seq) - 1)
                ]
                gg_store = build_snapshot_store(
                    gg_seq, self.num_nodes, self.num_rels,
                    edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
                    triple_bucket=tc.triple_bucket, pad_front=0,
                    halo_shards=self._halo_shards(), rc_mode=self.cfg.rc_mode,
                )
            else:
                gg_store = None  # alias of g_store; resolved after sharding
            if self.mesh is not None:
                from regcn_tpu.parallel.sharding import shard_snapshot_store

                g_store = shard_snapshot_store(g_store, self.mesh)
                if gg_store is not None:
                    gg_store = shard_snapshot_store(gg_store, self.mesh)
            if gg_store is None:
                gg_store = g_store
            his = self._build_his_store(
                list(eval_list),
                times=[time_offset + t for t in range(len(eval_list))])
            # filter COOs over the stacked [2B] query layout, padded [T, F]
            B = his.raw.shape[1]
            ers, ecs, rrs, rcs, allms = [], [], [], [], []
            raws = np.asarray(his.raw)
            invs = np.asarray(his.inv)
            masks = np.asarray(his.mask)
            for t in range(len(eval_list)):
                allq = np.concatenate([raws[t], invs[t]])
                allms.append(np.concatenate([masks[t], masks[t]]) > 0)
                r1, c1 = metrics.filter_coo_padded(
                    ent_filters[t] if ent_filters else None,
                    allq[:, [0, 1]], allq[:, 2])
                r2, c2 = metrics.filter_coo_padded(
                    rel_filters[t] if rel_filters else None,
                    allq[:, [0, 2]], allq[:, 1])
                ers.append(r1); ecs.append(c1); rrs.append(r2); rcs.append(c2)
            F1 = max(len(r) for r in ers)
            F2 = max(len(r) for r in rrs)

            def pad2(rows_list, cols_list, F):
                T = len(rows_list)
                rows = np.full((T, F), 2 * B, np.int64)
                cols = np.zeros((T, F), np.int64)
                for t, (r, c) in enumerate(zip(rows_list, cols_list)):
                    rows[t, : len(r)] = r
                    cols[t, : len(c)] = c
                return jnp.asarray(rows), jnp.asarray(cols)

            er, ec = pad2(ers, ecs, F1)
            rr, rc = pad2(rrs, rcs, F2)
            allm = np.stack(allms)
            if cache_key is not None:
                self._eval_cache[cache_key] = (g_store, gg_store, his, er, ec,
                                               rr, rc, allm)
        ranks = jax.device_get(
            self.eval_fn(state, g_store, gg_store, his, er, ec, rr, rc))
        out = {}
        for key, arr in zip(("ent_raw", "ent_filter", "rel_raw", "rel_filter"),
                            ranks):
            out[key] = metrics.stat_ranks(
                [arr[t][allm[t]] for t in range(arr.shape[0])])
        return out

    def evaluate(self, state, history_list, eval_list, ent_filters=None,
                 rel_filters=None, time_offset: int = 0, fused: bool = True,
                 cache_key=None, multi_step: bool = False, topk: int = 10,
                 relation_evaluation: bool = False):
        if fused and not multi_step:
            return self.evaluate_fused(state, history_list, eval_list,
                                       ent_filters, rel_filters,
                                       time_offset=time_offset,
                                       cache_key=cache_key)
        tc = self.tc
        window = list(history_list[-tc.test_history_len:])
        ranks = {"ent_raw": [], "ent_filter": [], "rel_raw": [], "rel_filter": []}
        for t, snap in enumerate(eval_list):
            history = self._history(window)
            history_gg = self._history(union_snapshots(window))
            # multi-step: no ground truth beyond the last real snapshot,
            # so the sparse-history vocab is frozen at time_offset
            # (ref:hisres_main.py:53-58, :81-89)
            t_vocab = time_offset if multi_step else time_offset + t
            raw, inv, mask, hg_raw, hg_inv, rel_vocab = self._batch(snap, t_vocab)
            mask_np = np.asarray(mask)
            allq = np.concatenate([np.asarray(raw), np.asarray(inv)])
            allm = np.concatenate([mask_np, mask_np]) > 0
            er, ec = metrics.filter_coo_padded(
                ent_filters[t] if ent_filters else None, allq[:, [0, 1]], allq[:, 2])
            rr, rc = metrics.filter_coo_padded(
                rel_filters[t] if rel_filters else None, allq[:, [0, 2]], allq[:, 1])
            if multi_step:
                from regcn_tpu.train.loop import construct_snap, construct_snap_r

                s_ent, s_rel = self.predict_step(
                    state, history, history_gg, raw, inv, mask, hg_raw,
                    hg_inv, rel_vocab)
                s_ent = np.asarray(s_ent, np.float64)
                s_rel = np.asarray(s_rel, np.float64)
                ranks["ent_raw"].append(
                    metrics.ranks_from_scores(s_ent[allm], allq[allm][:, 2]))
                ranks["ent_filter"].append(metrics.filtered_ranks(
                    s_ent[allm], allq[allm][:, [0, 1]], allq[allm][:, 2],
                    ent_filters[t] if ent_filters else None))
                ranks["rel_raw"].append(
                    metrics.ranks_from_scores(s_rel[allm], allq[allm][:, 1]))
                ranks["rel_filter"].append(metrics.filtered_ranks(
                    s_rel[allm], allq[allm][:, [0, 2]], allq[allm][:, 1],
                    rel_filters[t] if rel_filters else None))
                # feed top-k predictions back into the rolling window
                # (ref:hisres_main.py:129-137)
                if relation_evaluation:
                    pred = construct_snap_r(allq[allm], self.num_rels,
                                            s_rel[allm], topk)
                else:
                    pred = construct_snap(allq[allm], self.num_rels,
                                          s_ent[allm], topk)
                window.pop(0)
                window.append(pred if len(pred) else snap)
                continue
            r1, r2, r3, r4 = self.rank_step(
                state, history, history_gg, raw, inv, mask, hg_raw, hg_inv,
                rel_vocab, jnp.asarray(er), jnp.asarray(ec),
                jnp.asarray(rr), jnp.asarray(rc))
            ranks["ent_raw"].append(np.asarray(r1)[allm])
            ranks["ent_filter"].append(np.asarray(r2)[allm])
            ranks["rel_raw"].append(np.asarray(r3)[allm])
            ranks["rel_filter"].append(np.asarray(r4)[allm])
            window.pop(0)
            window.append(snap)
        return {k: metrics.stat_ranks(v) for k, v in ranks.items()}

    def analysis_record(self, state) -> dict:
        """--run-analysis sample: gradient norms on the first full
        training window + entity-embedding norms (ref:hisres_main.py:255
        analysis mode; per-epoch, see __init__)."""
        from regcn_tpu.utils.profiling import embedding_stats, gradient_stats

        hlen = self.tc.train_history_len
        i = min(max(hlen, 1), len(self.train_list) - 1)
        lo = max(0, i - hlen)
        window = self.train_list[lo:i]
        history = self._history(window, key=(lo, i))
        history_gg = self._history(union_snapshots(window), key=(lo, i, "gg"))
        raw, inv, mask, hg_raw, hg_inv, rel_vocab = self._batch(
            self.train_list[i], i)
        if self._analysis_grad is None:
            self._analysis_grad = jax.jit(jax.grad(self._loss_fn, has_aux=True))
        grads, _ = self._analysis_grad(
            state.params, state.model_state, history, history_gg, raw, inv,
            mask, hg_raw, hg_inv, rel_vocab, jax.random.PRNGKey(0))
        rec = gradient_stats(grads)
        rec.update(embedding_stats(state.params["dynamic_emb"], "entity"))
        return rec

    def fit(self, state=None, checkpoint_path=None, resume: bool = False,
            selection_metric: str = "ent_raw"):
        """``resume=True``: restore the full state from ``checkpoint_path``
        and continue from the saved epoch. ``selection_metric``:
        "ent_raw" (default) or "rel_raw" (--relation-evaluation
        best-checkpoint selection, cf. ref:hyperbolic_main.py:672)."""
        tc = self.tc
        if selection_metric not in ("ent_raw", "rel_raw"):
            raise ValueError(
                f"selection_metric must be 'ent_raw' or 'rel_raw', got "
                f"{selection_metric!r}")
        if state is None:
            state = self.init_state(jax.random.PRNGKey(tc.seed))
        start_epoch, best_mrr, best_epoch = 0, 0.0, -1
        from regcn_tpu.train.state import (
            has_resumable_checkpoint,
            restore_for_resume,
        )

        if resume and has_resumable_checkpoint(checkpoint_path):
            state, start_epoch, best_mrr, best_epoch = restore_for_resume(
                checkpoint_path, state)
            log.info("resumed from %s at epoch %d (best MRR %.4f @ %d)",
                     checkpoint_path, start_epoch, best_mrr, best_epoch)
        ent_f = build_answer_filters_by_time(self.data.valid, self.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.valid, self.num_rels, True)
        # copy: the first epoch donates `state`'s buffers, and with resume
        # restoring best_mrr no epoch may improve on it
        from regcn_tpu.train.state import copy_state as _copy

        best_state = _copy(state)
        for epoch in range(start_epoch, tc.n_epochs):
            t0 = time.time()
            state, losses = self.run_epoch(state, epoch)
            stats = self.evaluate(state, self.train_list, self.valid_list,
                                  ent_f, rel_f, time_offset=len(self.train_list),
                                  cache_key="valid")
            mrr = stats[selection_metric].mrr
            log.info("epoch %03d | e/r/s %.4f/%.4f/%.4f | %s MRR %.4f | %.1fs",
                     epoch, losses["entity"], losses["relation"], losses["static"],
                     selection_metric, mrr, time.time() - t0)
            if self.run_analysis:
                rec = self.analysis_record(state)
                log.info("analysis %03d | grad global %.4e | ent norm %.3f±%.3f",
                         epoch, rec["global_norm"], rec["entity_norm_mean"],
                         rec["entity_norm_std"])
            if mrr > best_mrr:
                # deep copy: the next epoch donates `state`'s buffers
                from regcn_tpu.train.state import copy_state

                best_mrr, best_state, best_epoch = mrr, copy_state(state), epoch
                if checkpoint_path:
                    from regcn_tpu.train.state import save_checkpoint

                    save_checkpoint(checkpoint_path, state, {"epoch": epoch, "mrr": mrr})
            if checkpoint_path:
                from regcn_tpu.train.state import save_last_checkpoint

                save_last_checkpoint(checkpoint_path, state, epoch,
                                     best_mrr, best_epoch)
        if checkpoint_path:
            from regcn_tpu.train.state import wait_for_checkpoints

            wait_for_checkpoints()  # commit in-flight async saves
        return best_state, {"best_valid_mrr_raw": best_mrr,
                            "selection_metric": selection_metric}

    def test(self, state, multi_step: bool = False, topk: int = 10,
             relation_evaluation: bool = False):
        ent_f = build_answer_filters_by_time(self.data.test, self.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.test, self.num_rels, True)
        return self.evaluate(
            state, self.train_list + self.valid_list, self.test_list,
            ent_f, rel_f,
            time_offset=len(self.train_list) + len(self.valid_list),
            cache_key="test", multi_step=multi_step, topk=topk,
            relation_evaluation=relation_evaluation,
        )
