"""Training and evaluation drivers.

Replaces ref:src/main.py:33-291 (epoch loop, rolling-history test loop,
best-checkpoint logic) with a jit-compiled train step over cached padded
history windows and a vectorised filtered-MRR evaluation.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import random
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.config import ExperimentConfig
from regcn_tpu.data.answers import AnswerFilter, build_answer_filters_by_time
from regcn_tpu.data.dataset import TKGData
from regcn_tpu.data.snapshots import (
    Snapshot,
    build_history,
    build_snapshot,
    pad_triples,
    split_by_time,
)
from regcn_tpu.models import recurrent
from regcn_tpu.train import metrics
from regcn_tpu.train.state import TrainState, create_train_state, make_optimizer

log = logging.getLogger(__name__)


def construct_snap(
    triples: np.ndarray, num_rels: int, scores: np.ndarray, topk: int
) -> np.ndarray:
    """Convert top-k entity predictions into a synthetic snapshot for
    multi-step inference (ref:rgcn/utils.py:367-381)."""
    top = np.argsort(-scores, axis=1)[:, :topk]
    out = []
    for i in range(len(triples)):
        h, r = int(triples[i][0]), int(triples[i][1])
        for idx in top[i]:
            if r < num_rels:
                out.append([h, r, int(idx)])
            else:
                out.append([int(idx), r - num_rels, h])
    return np.asarray(out, dtype=np.int64)


def construct_snap_r(
    triples: np.ndarray, num_rels: int, rel_scores: np.ndarray, topk: int
) -> np.ndarray:
    """Relation-prediction variant (ref:rgcn/utils.py:383-405)."""
    top = np.argsort(-rel_scores, axis=1)[:, :topk]
    out = []
    for i in range(len(triples)):
        h, t = int(triples[i][0]), int(triples[i][2])
        for idx in top[i]:
            if idx < num_rels:
                out.append([h, int(idx), t])
            else:
                out.append([t, int(idx) - num_rels, h])
    return np.asarray(out, dtype=np.int64)


class Trainer:
    def __init__(self, cfg: ExperimentConfig, data: TKGData, impl: str = "xla",
                 mesh=None, dist_agg: str = "gspmd",
                 run_analysis: bool = False):
        """``mesh`` (a jax.sharding.Mesh with a ``graph`` axis) enables
        multi-chip training: entity tables/optimizer moments row-sharded,
        fused epochs jitted over the mesh. ``dist_agg`` picks the
        cross-shard RGCN aggregation: ``"gspmd"`` (XLA-inserted
        all-gathers from sharding annotations) or ``"halo"`` (explicit
        shard_map boundary-set exchange, parallel/halo.py).
        ``run_analysis`` logs per-epoch gradient + embedding statistics
        during fit() (re-design of ref:src/main.py:184 analysis mode:
        the fused epoch precludes mid-epoch host logging, so stats are
        sampled once per epoch on the first full training window)."""
        if dist_agg not in ("gspmd", "halo"):
            raise ValueError(f"dist_agg must be 'gspmd' or 'halo', got {dist_agg!r}")
        if mesh is None and dist_agg == "halo":
            raise ValueError("dist_agg='halo' requires a mesh")
        from regcn_tpu.dist import check_impl_compatible

        check_impl_compatible(impl, dist_agg)
        self.cfg = cfg
        self.data = data
        self.impl = impl
        self.mesh = mesh
        self.dist_agg = dist_agg
        if mesh is not None:
            from regcn_tpu.parallel.mesh import check_entity_divisibility

            check_entity_divisibility(data.num_nodes, mesh)
            if dist_agg == "halo":
                from regcn_tpu.dist import HaloImpl

                impl = HaloImpl(mesh)
                self.impl = impl
        self.num_rels = data.num_rels
        self.num_nodes = data.num_nodes

        self.train_list = split_by_time(data.train)
        self.valid_list = split_by_time(data.valid)
        self.test_list = split_by_time(data.test)
        if cfg.train.dilate_len > 1:
            from regcn_tpu.data.snapshots import dilate_snapshots

            self.train_list = dilate_snapshots(self.train_list, cfg.train.dilate_len)

        self.static_snap = None
        if cfg.model.use_static and data.static_triples is not None:
            n_total = data.num_nodes + data.num_words
            self.static_snap = build_snapshot(
                data.static_triples, n_total, data.num_static_rels,
                edge_bucket=cfg.train.edge_bucket,
            )

        self._history_cache: Dict[Tuple[int, int], Snapshot] = {}
        self._triple_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

        mc, tc = cfg.model, cfg.train

        from regcn_tpu.utils.dtypes import tree_to_compute, tree_to_fp32

        cdt = jnp.dtype(mc.dtype)

        def loss_fn(params, model_state, history, triples, mask, rng):
            params = tree_to_compute(params, cdt)
            history = tree_to_compute(history, cdt)
            loss_ent, losses, new_state = recurrent.get_loss(
                params, model_state, mc, history, triples, mask,
                static_snap=self.static_snap, rng=rng, train=True, impl=impl,
            )
            total = (
                tc.task_weight * losses["entity"]
                + (1.0 - tc.task_weight) * losses["relation"]
                + losses["static"]
            )
            return total, (losses, new_state)

        opt = make_optimizer(tc)

        def train_step(state: TrainState, history, triples, mask):
            rng, step_rng = jax.random.split(state.rng)
            grads, (losses, new_model_state) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.model_state, history, triples, mask, step_rng
            )
            if cdt != jnp.float32:
                grads = tree_to_fp32(grads)
                losses = tree_to_fp32(losses)
            updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(
                params=new_params,
                opt_state=new_opt_state,
                model_state=new_model_state,
                rng=rng,
                step=state.step + 1,
            )
            return new_state, losses

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        # --run-analysis: non-donating grad pass for per-epoch stats
        self.run_analysis = run_analysis
        self._loss_fn = loss_fn
        self._analysis_grad = None

        def predict_step(state: TrainState, history, triples, mask):
            return recurrent.predict(
                state.params, state.model_state, mc, history, triples, mask,
                static_snap=self.static_snap, impl=impl,
            )

        self.predict_step = jax.jit(predict_step)

        def rank_step(state, history, triples, mask, ent_rows, ent_cols,
                      rel_rows, rel_cols):
            """Eval ranks computed ON DEVICE: only [B] vectors go to host
            (the [B, N] score matrices never cross the host boundary)."""
            s_ob, s_rel = predict_step(state, history, triples, mask)
            return (
                metrics.device_ranks(s_ob, triples[:, 2]),
                metrics.device_filtered_ranks(s_ob, triples[:, 2], ent_rows, ent_cols),
                metrics.device_ranks(s_rel, triples[:, 1]),
                metrics.device_filtered_ranks(s_rel, triples[:, 1], rel_rows, rel_cols),
            )

        self.rank_step = jax.jit(rank_step)

        self._store = None
        self._epoch_fn = None
        self._eval_fn = None
        self._eval_cache: Dict = {}

    # ------------------------------------------------------------------ data
    def _history(self, snaps: Sequence[np.ndarray], cache_key=None) -> Snapshot:
        if cache_key is not None and cache_key in self._history_cache:
            return self._history_cache[cache_key]
        h = build_history(
            list(snaps), self.num_nodes, self.num_rels,
            edge_bucket=self.cfg.train.edge_bucket,
            rc_bucket=self.cfg.train.rc_bucket,
        )
        G = self._halo_shards()
        if G:
            from regcn_tpu.dist import attach_history_halo

            h = attach_history_halo(h, snaps, self.num_nodes, self.num_rels,
                                    G, edge_bucket=self.cfg.train.edge_bucket)
        if cache_key is not None:
            self._history_cache[cache_key] = h
        return h

    def _triples(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if idx not in self._triple_cache:
            self._triple_cache[idx] = pad_triples(
                self.train_list[idx], self.num_rels, self.cfg.train.triple_bucket
            )
        return self._triple_cache[idx]

    # ----------------------------------------------------------------- train
    def _halo_shards(self):
        from regcn_tpu.dist import halo_shards

        return halo_shards(self.mesh, self.dist_agg)

    def _ensure_store(self):
        if self._store is None:
            from regcn_tpu.train.epoch import build_snapshot_store, make_epoch_fn

            tc = self.cfg.train
            # front-padded with hlen empty identity snapshots so EVERY
            # training index (including the short-history prefix) runs in
            # the single fused scan — no per-step dispatches at all
            self._store = build_snapshot_store(
                self.train_list, self.num_nodes, self.num_rels,
                edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
                triple_bucket=tc.triple_bucket, pad_front=tc.train_history_len,
                halo_shards=self._halo_shards(),
            )
            if self.mesh is not None:
                from regcn_tpu.parallel.sharding import (
                    make_sharded_epoch_fn,
                    shard_snapshot_store,
                )

                self._store = shard_snapshot_store(self._store, self.mesh)
                self._epoch_fn = make_sharded_epoch_fn(
                    self.cfg.model, tc, self.mesh,
                    static_snap=self.static_snap, impl=self.impl,
                    pad_front=tc.train_history_len, agg=self.dist_agg,
                )
            else:
                self._epoch_fn = make_epoch_fn(
                    self.cfg.model, tc, static_snap=self.static_snap,
                    impl=self.impl, pad_front=tc.train_history_len,
                )
        return self._store, self._epoch_fn

    def run_epoch_fused(
        self, state: TrainState, epoch: int
    ) -> Tuple[TrainState, Dict[str, float]]:
        """Whole-epoch device-resident training: ONE XLA call per epoch
        (short-history windows ride the same scan via empty front-pad
        snapshots that the evolution step treats as identity)."""
        import numpy as _np

        tc = self.cfg.train
        store, epoch_fn = self._ensure_store()
        sums = {"entity": 0.0, "relation": 0.0, "static": 0.0}
        order = _np.arange(1, len(self.train_list), dtype=_np.int32)
        _np.random.default_rng(tc.seed + epoch).shuffle(order)
        n = len(order)
        if n:
            state, loss_stack = epoch_fn(state, store, jnp.asarray(order))
            # ONE device->host round trip for all loss components (through
            # a remote tunnel, per-scalar float() syncs dominate otherwise)
            loss_host = jax.device_get(loss_stack)
            for k in sums:
                sums[k] += float(_np.sum(loss_host[k]))
        return state, {k: v / max(n, 1) for k, v in sums.items()}

    def run_epoch(self, state: TrainState, epoch: int) -> Tuple[TrainState, Dict[str, float]]:
        tc = self.cfg.train
        idx = list(range(len(self.train_list)))
        random.Random(tc.seed + epoch).shuffle(idx)
        sums = {"entity": 0.0, "relation": 0.0, "static": 0.0}
        n = 0
        for i in idx:
            if i == 0:
                continue  # no history for the first snapshot (ref:src/main.py:224)
            lo = max(0, i - tc.train_history_len)
            history = self._history(self.train_list[lo:i], cache_key=(lo, i))
            triples, mask = self._triples(i)
            state, losses = self.train_step(state, history, triples, mask)
            for k in sums:
                sums[k] += float(losses[k])
            n += 1
        return state, {k: v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------- analysis
    def analysis_record(self, state: TrainState) -> Dict[str, float]:
        """--run-analysis sample: gradient norms on the first full
        training window + entity-embedding row-norm stats (re-design of
        ref:src/main.py:184 / ref:hyperbolic_main.py:624-625 — the fused
        epoch precludes the reference's every-100-snapshots host logging,
        so one representative grad pass per epoch)."""
        from regcn_tpu.utils.profiling import embedding_stats, gradient_stats

        tc = self.cfg.train
        i = min(tc.train_history_len, len(self.train_list) - 1)
        lo = max(0, i - tc.train_history_len)
        history = self._history(self.train_list[lo:i], cache_key=(lo, i))
        triples, mask = self._triples(i)
        if self._analysis_grad is None:
            self._analysis_grad = jax.jit(
                jax.grad(self._loss_fn, has_aux=True))
        grads, _ = self._analysis_grad(
            state.params, state.model_state, history, jnp.asarray(triples),
            jnp.asarray(mask), jax.random.PRNGKey(0))
        rec = gradient_stats(grads)
        rec.update(embedding_stats(state.params["dynamic_emb"], "entity"))
        return rec

    # ------------------------------------------------------------------ eval
    def _eval_resources(self, history_list, eval_list, ent_filters,
                        rel_filters, cache_key=None):
        if cache_key is not None and cache_key in self._eval_cache:
            return self._eval_cache[cache_key]
        from regcn_tpu.train.epoch import (
            build_eval_store,
            make_eval_fn,
            stack_eval_filters,
        )

        tc, mc = self.cfg.train, self.cfg.model
        hlen = tc.test_history_len
        store = build_eval_store(
            history_list, eval_list, self.num_nodes, self.num_rels, hlen,
            edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
            triple_bucket=tc.triple_bucket, halo_shards=self._halo_shards(),
        )
        if self.mesh is not None:
            from regcn_tpu.parallel.sharding import shard_snapshot_store

            store = shard_snapshot_store(store, self.mesh)
        er, ec = stack_eval_filters(ent_filters, eval_list, self.num_rels,
                                    tc.triple_bucket, rel_mode=False)
        rr, rc = stack_eval_filters(rel_filters, eval_list, self.num_rels,
                                    tc.triple_bucket, rel_mode=True)
        if self._eval_fn is None:
            def predict_fn(st, history, triples, mask):
                return recurrent.predict(
                    st.params, st.model_state, mc, history, triples, mask,
                    static_snap=self.static_snap, impl=self.impl,
                )

            self._eval_fn = make_eval_fn(predict_fn, hlen)
        tmask = np.asarray(store.triple_mask)[hlen:] > 0  # [T, B] host copy
        res = (store, er, ec, rr, rc, tmask)
        if cache_key is not None:
            self._eval_cache[cache_key] = res
        return res

    def evaluate_fused(
        self,
        state: TrainState,
        history_list: List[np.ndarray],
        eval_list: List[np.ndarray],
        ent_filters: Optional[List[AnswerFilter]] = None,
        rel_filters: Optional[List[AnswerFilter]] = None,
        cache_key=None,
    ) -> Dict[str, metrics.RankStats]:
        """Whole-split rolling-window evaluation as ONE device call."""
        store, er, ec, rr, rc, tmask = self._eval_resources(
            history_list, eval_list, ent_filters, rel_filters, cache_key
        )
        ranks = jax.device_get(self._eval_fn(state, store, er, ec, rr, rc))
        out = {}
        for key, arr in zip(("ent_raw", "ent_filter", "rel_raw", "rel_filter"),
                            ranks):
            out[key] = metrics.stat_ranks(
                [arr[t][tmask[t]] for t in range(arr.shape[0])]
            )
        return out

    def evaluate(
        self,
        state: TrainState,
        history_list: List[np.ndarray],
        eval_list: List[np.ndarray],
        ent_filters: Optional[List[AnswerFilter]] = None,
        rel_filters: Optional[List[AnswerFilter]] = None,
        multi_step: bool = False,
        topk: int = 10,
        relation_evaluation: bool = False,
        cache_key=None,
    ) -> Dict[str, metrics.RankStats]:
        """Rolling-window evaluation (ref:src/main.py:33-107).

        ``relation_evaluation`` switches the multi-step feedback from
        top-k ENTITY predictions to top-k RELATION predictions
        (ref:src/main.py:91-95)."""
        if multi_step and self.dist_agg == "halo":
            raise ValueError(
                "multi-step inference rebuilds history from predictions "
                "per step (host loop) and is not supported under "
                "dist_agg='halo'; use dist_agg='gspmd' mesh mode for it")
        if not multi_step:
            return self.evaluate_fused(
                state, history_list, eval_list, ent_filters, rel_filters,
                cache_key=cache_key,
            )
        tc = self.cfg.train
        window = list(history_list[-tc.test_history_len:])
        ranks: Dict[str, List[np.ndarray]] = {
            "ent_raw": [], "ent_filter": [], "rel_raw": [], "rel_filter": []
        }
        for t, snap in enumerate(eval_list):
            history = self._history(window)
            triples, mask = pad_triples(snap, self.num_rels, tc.triple_bucket)
            valid = mask > 0
            tq = triples[valid]

            if multi_step:
                # multi-step needs the dense entity scores on host
                scores_ob, scores_rel = self.predict_step(state, history, triples, mask)
                s_ob = np.asarray(scores_ob, np.float64)[valid]
                s_rel = np.asarray(scores_rel, np.float64)[valid]
                ranks["ent_raw"].append(metrics.ranks_from_scores(s_ob, tq[:, 2]))
                ranks["ent_filter"].append(metrics.filtered_ranks(
                    s_ob, tq[:, [0, 1]], tq[:, 2],
                    ent_filters[t] if ent_filters else None))
                ranks["rel_raw"].append(metrics.ranks_from_scores(s_rel, tq[:, 1]))
                ranks["rel_filter"].append(metrics.filtered_ranks(
                    s_rel, tq[:, [0, 2]], tq[:, 1],
                    rel_filters[t] if rel_filters else None))
                if relation_evaluation:
                    pred = construct_snap_r(tq, self.num_rels, s_rel, topk)
                else:
                    pred = construct_snap(tq, self.num_rels, s_ob, topk)
                if len(pred):
                    window.pop(0)
                    window.append(pred)
                continue

            er, ec = metrics.filter_coo_padded(
                ent_filters[t] if ent_filters else None, triples[:, [0, 1]], triples[:, 2])
            rr, rc = metrics.filter_coo_padded(
                rel_filters[t] if rel_filters else None, triples[:, [0, 2]], triples[:, 1])
            r1, r2, r3, r4 = self.rank_step(
                state, history, triples, mask,
                jnp.asarray(er), jnp.asarray(ec), jnp.asarray(rr), jnp.asarray(rc))
            ranks["ent_raw"].append(np.asarray(r1)[valid])
            ranks["ent_filter"].append(np.asarray(r2)[valid])
            ranks["rel_raw"].append(np.asarray(r3)[valid])
            ranks["rel_filter"].append(np.asarray(r4)[valid])

            window.pop(0)
            window.append(snap)
        return {k: metrics.stat_ranks(v) for k, v in ranks.items()}

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        state: Optional[TrainState] = None,
        checkpoint_path: Optional[str] = None,
        log_every: int = 1,
        resume: bool = False,
        selection_metric: str = "ent_raw",
    ) -> Tuple[TrainState, Dict]:
        """Full training run with best-on-valid checkpointing
        (ref:src/main.py:211-279).

        ``selection_metric``: which valid MRR picks the best checkpoint —
        "ent_raw" (default) or "rel_raw" (the reference's
        --relation-evaluation selection, ref:src/main.py:266,
        ref:hyperbolic_main.py:672).

        ``resume=True``: if ``checkpoint_path`` holds a checkpoint, restore
        the full TrainState (params + optimizer moments + BN stats + PRNG +
        step) and continue from the saved epoch. The reference can only
        restart from scratch (it saves bare ``state_dict`` and never
        reloads mid-training, ref:src/main.py:266-279).
        """
        cfg, tc = self.cfg, self.cfg.train
        if selection_metric not in ("ent_raw", "rel_raw"):
            raise ValueError(
                f"selection_metric must be 'ent_raw' or 'rel_raw', got "
                f"{selection_metric!r}")
        start_epoch, best_mrr, best_epoch = 0, 0.0, -1
        if state is None:
            state = create_train_state(
                jax.random.PRNGKey(tc.seed), cfg.model, tc
            )
            if self.mesh is not None:
                from regcn_tpu.parallel.sharding import state_sharding_rules

                state = jax.device_put(
                    state, state_sharding_rules(state, self.mesh))
        from regcn_tpu.train.state import (
            has_resumable_checkpoint,
            restore_for_resume,
        )

        if resume and has_resumable_checkpoint(checkpoint_path):
            state, start_epoch, best_mrr, best_epoch = restore_for_resume(
                checkpoint_path, state)
            log.info("resumed from %s at epoch %d (best MRR %.4f @ %d)",
                     checkpoint_path, start_epoch, best_mrr, best_epoch)
        ent_filters_v = build_answer_filters_by_time(self.data.valid, self.num_rels, False)
        rel_filters_v = build_answer_filters_by_time(self.data.valid, self.num_rels, True)

        # copy: the first epoch donates `state`'s buffers, and with resume
        # restoring best_mrr no epoch may improve on it
        from regcn_tpu.train.state import copy_state as _copy

        best_state = _copy(state)
        history_rows = []
        for epoch in range(start_epoch, tc.n_epochs):
            t0 = time.time()
            state, losses = self.run_epoch_fused(state, epoch)
            dt = time.time() - t0
            if epoch % log_every == 0:
                log.info(
                    "epoch %04d | loss e/r/s: %.4f/%.4f/%.4f | %.1fs",
                    epoch, losses["entity"], losses["relation"], losses["static"], dt,
                )
            if self.run_analysis:
                rec = self.analysis_record(state)
                log.info("analysis %04d | grad global %.4e | ent norm %.3f±%.3f",
                         epoch, rec["global_norm"], rec["entity_norm_mean"],
                         rec["entity_norm_std"])
            if epoch % tc.evaluate_every == 0:
                stats = self.evaluate(
                    state, self.train_list, self.valid_list,
                    ent_filters_v, rel_filters_v, cache_key="valid",
                )
                mrr = stats[selection_metric].mrr
                row = {"epoch": epoch, "losses": losses, "valid_mrr_raw": stats["ent_raw"].mrr,
                       "valid_mrr_filter": stats["ent_filter"].mrr, "epoch_time_s": dt}
                if self.run_analysis:
                    row["analysis"] = rec
                history_rows.append(row)
                log.info(
                    "epoch %04d | valid %s MRR %.4f | ent raw/filt %.4f/%.4f "
                    "(best %.4f)", epoch, selection_metric, mrr,
                    stats["ent_raw"].mrr, stats["ent_filter"].mrr, best_mrr,
                )
                if mrr > best_mrr:
                    best_mrr, best_epoch = mrr, epoch
                    # deep copy: the next epoch donates `state`'s buffers
                    from regcn_tpu.train.state import copy_state

                    best_state = copy_state(state)
                    if checkpoint_path:
                        from regcn_tpu.train.state import save_checkpoint

                        save_checkpoint(checkpoint_path, state, {"epoch": epoch, "mrr": mrr})
            # outside the eval block: the 'last' sidecar is per-epoch even
            # with evaluate_every > 1 (matching the other two trainers), so
            # resume never re-runs up to evaluate_every-1 epochs
            if checkpoint_path:
                from regcn_tpu.train.state import save_last_checkpoint

                save_last_checkpoint(checkpoint_path, state, epoch,
                                     best_mrr, best_epoch)
        if checkpoint_path:
            from regcn_tpu.train.state import wait_for_checkpoints

            wait_for_checkpoints()  # commit in-flight async saves
        # NOTE: best_valid_mrr_raw carries the SELECTION metric's value
        # (relation raw MRR under selection_metric="rel_raw") — pair it
        # with the returned selection_metric when reporting
        return best_state, {"best_valid_mrr_raw": best_mrr,
                            "selection_metric": selection_metric,
                            "history": history_rows}

    def test(self, state: TrainState, multi_step: bool = False, topk: int = 10,
             relation_evaluation: bool = False):
        ent_f = build_answer_filters_by_time(self.data.test, self.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.test, self.num_rels, True)
        return self.evaluate(
            state, self.train_list + self.valid_list, self.test_list,
            ent_f, rel_f, multi_step=multi_step, topk=topk,
            relation_evaluation=relation_evaluation, cache_key="test",
        )
