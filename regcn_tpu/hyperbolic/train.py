"""Hyperbolic training driver.

Parity with ref:hyperbolic_src/hyperbolic_main.py:192-705: degree/
frequency radius targets, dual Riemannian/Euclidean optimizer, curvature
warmup scheduling (as a traced scalar — no recompiles), snapshot-inner
triple mini-batching with gradient accumulation, EST wiring (ETNR
retrieval + H-PES state threading + TANS masks), early stopping, and the
fused whole-epoch path. EST retrieval and TANS masks are dataset-only
functions, so they are precomputed per split into a device-resident
:class:`ESTStore` and the EST configuration runs through the same fused
epoch/eval scans as the base model (the reference re-queries the host
index every step).
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
from regcn_tpu.data.dataset import TKGData
from regcn_tpu.data.snapshots import build_history, build_snapshot, pad_triples, split_by_time
from regcn_tpu.hyperbolic import est as est_mod
from regcn_tpu.hyperbolic import model as hmodel
from regcn_tpu.hyperbolic.model import HyperbolicConfig, HypModelState
from regcn_tpu.hyperbolic.optim import dual_optimizer
from regcn_tpu.train import metrics
from regcn_tpu.train.epoch import SnapshotStore, build_snapshot_store, window_snapshot

log = logging.getLogger(__name__)


def compute_radius_targets(
    train_list: List[np.ndarray], num_nodes: int,
    alpha: float = 0.5, beta: float = 0.5,
    radius_min: float = 0.5, radius_max: float = 3.0,
) -> np.ndarray:
    """Degree/frequency-based radius targets
    (ref:hyperbolic_main.py:164-184), vectorised with np.unique."""
    freq = np.zeros(num_nodes, dtype=np.float64)
    pairs = []
    for snapshot in train_list:
        if len(snapshot) == 0:
            continue
        src, dst = snapshot[:, 0], snapshot[:, 2]
        freq += np.bincount(src, minlength=num_nodes)
        freq += np.bincount(dst, minlength=num_nodes)
        pairs.append(np.stack([src, dst], 1))
        pairs.append(np.stack([dst, src], 1))
    if pairs:
        uniq = np.unique(np.concatenate(pairs), axis=0)
        degree_counts = np.bincount(uniq[:, 0], minlength=num_nodes).astype(np.float64)
    else:
        degree_counts = np.zeros(num_nodes)
    score = alpha * np.log1p(degree_counts) + beta * np.log1p(freq)
    if score.max() - score.min() < 1e-9:
        normed = np.full_like(score, 0.5)
    else:
        normed = (score - score.min()) / (score.max() - score.min())
    return (radius_min + (radius_max - radius_min) * normed).astype(np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HypTrainState:
    params: Dict
    opt_state: object
    model_state: HypModelState
    est_state: Optional[est_mod.ESTState]
    rng: jax.Array
    step: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ESTStore:
    """Per-snapshot ETNR retrieval results and TANS masks for a whole
    split, device-resident — the EST host work (index queries, true-tail
    filters) depends only on the dataset, so it is precomputed once and
    the EST configuration trains/evaluates through the same fused
    whole-epoch scans as the base model (the reference re-queries the
    index per step, ref:hyperbolic_main.py:585-604)."""

    nb_ents: object = None  # [T, B, K] int32
    nb_rels: object = None  # [T, B, K] int32
    deltas: object = None  # [T, B, K] f32
    event_mask: object = None  # [T, B, K] f32
    tans_rows: object = None  # [T, M] int32 (row B == dropped)
    tans_cols: object = None  # [T, M] int32


class HyperbolicTrainer:
    def __init__(
        self,
        cfg: HyperbolicConfig,
        tc: TrainConfig,
        data: TKGData,
        triple_batch_size: Optional[int] = None,
        triple_batch_mode: str = "accumulate",
        curvature_warmup_epochs: int = 0,
        mesh=None,
        dist_agg: str = "gspmd",
        run_analysis: bool = False,
    ):
        if triple_batch_mode not in ("accumulate", "per_chunk"):
            raise ValueError(
                f"triple_batch_mode must be 'accumulate' (reference parity, "
                f"ref:hyperbolic_main.py:572-628) or 'per_chunk', got "
                f"{triple_batch_mode!r}")
        if dist_agg not in ("gspmd", "halo"):
            raise ValueError(f"dist_agg must be 'gspmd' or 'halo', got {dist_agg!r}")
        if dist_agg == "halo":
            if mesh is None:
                raise ValueError("dist_agg='halo' requires a mesh")
            if triple_batch_size:
                raise ValueError(
                    "dist_agg='halo' runs the fused-epoch path only; "
                    "triple_batch_size chunking is not supported with it")
            # thread the halo marker through cfg.impl: every encoder-cell
            # call dispatches on it (hyperbolic/layers.py) — all four
            # encoders shard through the boundary halo (the sum path via
            # halo_rgcn_aggregate; midpoint/centroid/attention via
            # halo_local_aggregate — their weighted segment reductions
            # are destination-local under the dst partition)
            from regcn_tpu.dist import HaloImpl

            cfg = dataclasses.replace(cfg, impl=HaloImpl(mesh))
        self.cfg = cfg
        self.tc = tc
        self.data = data
        self.triple_batch_size = triple_batch_size
        self.triple_batch_mode = triple_batch_mode
        self.curvature_warmup_epochs = curvature_warmup_epochs
        # optional jax.sharding.Mesh: entity tables/moments row-sharded
        # over the graph axis (GSPMD), same rules as parallel/sharding.py
        self.mesh = mesh
        self.dist_agg = dist_agg
        if mesh is not None:
            from regcn_tpu.parallel.mesh import check_entity_divisibility

            check_entity_divisibility(cfg.num_ents, mesh)
        self.num_rels = data.num_rels
        self.num_nodes = data.num_nodes
        self.train_list = split_by_time(data.train)
        self.valid_list = split_by_time(data.valid)
        self.test_list = split_by_time(data.test)
        self.radius_target = compute_radius_targets(
            self.train_list, data.num_nodes,
            alpha=cfg.radius_alpha, beta=cfg.radius_beta,
            radius_min=cfg.radius_min, radius_max=cfg.radius_max,
        )

        self.static_snap = None
        if cfg.use_static and data.static_triples is not None:
            n_total = data.num_nodes + data.num_words
            self.static_snap = build_snapshot(
                data.static_triples, n_total, data.num_static_rels,
                edge_bucket=tc.edge_bucket,
            )

        # EST host-side structures
        self.temporal_index = None
        self.true_tails = None
        if cfg.use_est:
            self.temporal_index = est_mod.TemporalIndex(cfg.est_history_len)
            self.temporal_index.build(self.train_list, self.num_rels)
        if cfg.use_time_aware_negative:
            self.true_tails = est_mod.build_true_tails_dict(self.train_list, self.num_rels)

        self.opt = dual_optimizer(
            tc.lr, cfg.c, tc.grad_norm, tc.weight_decay, cfg.manifold_entities
        )

        self._history_cache: Dict = {}
        self._store = None
        self._train_est_store = None
        # --run-analysis: per-epoch gradient/embedding/radius/curvature
        # stats during fit() (ref:hyperbolic_main.py:624-625 logs every
        # 100 snapshots; the fused epoch precludes mid-epoch host logging,
        # so one representative sample per epoch)
        self.run_analysis = run_analysis
        self._analysis_grad = None
        self._build_steps()

    # --------------------------------------------------------------- jitted
    def _build_steps(self):
        cfg, tc, opt = self.cfg, self.tc, self.opt
        cdt = jnp.dtype(cfg.compute_dtype)
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from regcn_tpu.parallel.mesh import GRAPH_AXIS

            _ent_rows = NamedSharding(mesh, P(GRAPH_AXIS, None))

        def constrain_entities(params):
            """Re-pin the entity table's row sharding across scan steps
            so GSPMD keeps the RGCN scatter and the decoder candidate
            axis shard-local (no-op without a mesh)."""
            if mesh is None:
                return params
            params = dict(params)
            params["dynamic_emb"] = jax.lax.with_sharding_constraint(
                params["dynamic_emb"], _ent_rows)
            return params

        from regcn_tpu.utils.dtypes import tree_to_compute, tree_to_fp32

        def to_compute(tree):
            # shared mixed-precision policy (utils/dtypes): fp32 array
            # leaves -> compute dtype; scalars (learnable curvature, score
            # margins, gate thresholds) stay fp32
            return tree_to_compute(tree, cdt)

        def loss_fn(params, model_state, history, triples, mask, rng,
                    cmax, est_inputs, tans):
            params = to_compute(params)
            history = to_compute(history)
            loss_ent, losses, new_state, aux = hmodel.get_loss(
                params, model_state, cfg, history, triples, mask,
                static_snap=self.static_snap, est_inputs=est_inputs,
                tans_mask_coo=tans, rng=rng, train=True, curvature_max=cmax,
            )
            total = (
                tc.task_weight * losses["entity"]
                + (1.0 - tc.task_weight) * losses["relation"]
                + losses["static"] + losses["radius"]
            )
            return total, (losses, new_state, aux)

        def train_step(state: HypTrainState, history, triples, mask, cmax,
                       rb=None, tans=None):
            rng, step_rng = jax.random.split(state.rng)
            est_inputs = (state.est_state, rb) if (cfg.use_est and rb is not None) else None
            grads, (losses, new_model_state, aux) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.model_state, history, triples, mask,
                step_rng, cmax, est_inputs, tans,
            )
            if cdt != jnp.float32:
                # grads come out in compute dtype; the optimizer is fp32
                grads = tree_to_fp32(grads)
                losses = tree_to_fp32(losses)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = constrain_entities(optax.apply_updates(state.params, updates))
            new_est = state.est_state
            if cfg.use_est and new_est is not None:
                # H-PES writeback from the enriched embeddings (ref :650-671)
                from regcn_tpu.hyperbolic import ops as H

                ctx_tan = aux.get("est_ctx_tan")
                if ctx_tan is None:  # no retrieval batch: unenriched rows
                    ctx_tan = H.log_map_zero(
                        aux["pre_emb"][triples[:, 0]], aux["curvature"])
                new_est = est_mod.update_states(
                    state.params["est"], new_est, triples[:, 0], mask,
                    ctx_tan, cfg.est_state_alpha,
                )
            return (
                HypTrainState(params=new_params, opt_state=new_opt,
                              model_state=new_model_state, est_state=new_est,
                              rng=rng, step=state.step + 1),
                losses,
            )

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self._loss_fn = loss_fn  # exposed for --run-analysis grad stats

        def accum_grad_step(state: HypTrainState, acc, history, triples, mask,
                            cmax, rb=None, tans=None):
            """One mini-batch forward/backward WITHOUT an optimizer step:
            adds this chunk's fp32 grads into the accumulator and threads
            model/EST/PRNG state (ref:hyperbolic_main.py:585-604 —
            ``loss.backward()`` per mini-batch, grads summed)."""
            rng, step_rng = jax.random.split(state.rng)
            est_inputs = (state.est_state, rb) if (cfg.use_est and rb is not None) else None
            grads, (losses, new_model_state, aux) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.model_state, history, triples, mask,
                step_rng, cmax, est_inputs, tans,
            )
            if cdt != jnp.float32:
                grads = tree_to_fp32(grads)
                losses = tree_to_fp32(losses)
            acc = jax.tree.map(jnp.add, acc, grads)
            new_est = state.est_state
            if cfg.use_est and new_est is not None:
                from regcn_tpu.hyperbolic import ops as H

                ctx_tan = aux.get("est_ctx_tan")
                if ctx_tan is None:  # no retrieval batch: unenriched rows
                    ctx_tan = H.log_map_zero(
                        aux["pre_emb"][triples[:, 0]], aux["curvature"])
                new_est = est_mod.update_states(
                    state.params["est"], new_est, triples[:, 0], mask,
                    ctx_tan, cfg.est_state_alpha,
                )
            return (
                HypTrainState(params=state.params, opt_state=state.opt_state,
                              model_state=new_model_state, est_state=new_est,
                              rng=rng, step=state.step),
                acc,
                losses,
            )

        self.accum_grad_step = jax.jit(accum_grad_step, donate_argnums=(0, 1))

        def apply_accumulated(state: HypTrainState, acc):
            """Optimizer step from summed mini-batch grads; the optax chain
            clips AFTER accumulation, matching the reference's
            ``clip_grad_norm_`` → ``optimizer.step()`` once per snapshot
            (ref:hyperbolic_main.py:627-628)."""
            updates, new_opt = opt.update(acc, state.opt_state, state.params)
            new_params = constrain_entities(optax.apply_updates(state.params, updates))
            return HypTrainState(params=new_params, opt_state=new_opt,
                                 model_state=state.model_state,
                                 est_state=state.est_state,
                                 rng=state.rng, step=state.step + 1)

        self.apply_accumulated = jax.jit(apply_accumulated, donate_argnums=(0, 1))
        self.zero_grads = jax.jit(
            lambda params: jax.tree.map(jnp.zeros_like, params))

        def predict_step(state: HypTrainState, history, triples, mask, rb=None):
            est_inputs = (state.est_state, rb) if (cfg.use_est and rb is not None) else None
            s_ob, s_rel = hmodel.predict(
                to_compute(state.params), state.model_state, cfg,
                to_compute(history), triples, mask,
                static_snap=self.static_snap, est_inputs=est_inputs,
            )
            return s_ob.astype(jnp.float32), s_rel.astype(jnp.float32)

        self.predict_step = jax.jit(predict_step)

        def rank_step(state, history, triples, mask, ent_rows, ent_cols,
                      rel_rows, rel_cols, rb=None):
            """On-device raw+filtered ranks (only [B] vectors leave)."""
            s_ob, s_rel = predict_step(state, history, triples, mask, rb)
            return (
                metrics.device_ranks(s_ob, triples[:, 2]),
                metrics.device_filtered_ranks(s_ob, triples[:, 2], ent_rows, ent_cols),
                metrics.device_ranks(s_rel, triples[:, 1]),
                metrics.device_filtered_ranks(s_rel, triples[:, 1], rel_rows, rel_cols),
            )

        self.rank_step = jax.jit(rank_step)

        # fused whole-epoch path; the store is front-padded with hlen empty
        # identity snapshots so short-history prefix indices run in the same
        # scan. EST retrieval / TANS masks come precomputed in an ESTStore
        # (they depend only on the dataset), sliced per scan step.
        hlen = tc.train_history_len

        def _rb_at(est: ESTStore, i, mask):
            if not cfg.use_est or est is None or est.nb_ents is None:
                return None
            return est_mod.RetrievalBatch(
                nb_ents=est.nb_ents[i], nb_rels=est.nb_rels[i],
                deltas=est.deltas[i], event_mask=est.event_mask[i],
                row_mask=mask,
            )

        def epoch_fn(state: HypTrainState, store: SnapshotStore,
                     est: Optional[ESTStore], order, cmax):
            def body(st, i):
                history = window_snapshot(store, i, hlen)  # = [i-hlen+pad_front, ...)
                triples = store.triples[i + hlen]
                mask = store.triple_mask[i + hlen]
                rb = _rb_at(est, i, mask)
                tans = (
                    (est.tans_rows[i], est.tans_cols[i])
                    if cfg.use_time_aware_negative and est is not None
                    and est.tans_rows is not None else None
                )
                return train_step(st, history, triples, mask, cmax, rb, tans)

            return jax.lax.scan(body, state, order)

        self.epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))

        # fused whole-split evaluation (one device call per eval split);
        # EST retrieval rides in an ESTStore aligned with the eval store
        from regcn_tpu.train import metrics as _metrics

        ehlen = tc.test_history_len

        def eval_fn(state, store: SnapshotStore, est: Optional[ESTStore],
                    ent_rows, ent_cols, rel_rows, rel_cols):
            n_eval = ent_rows.shape[0]

            def body(_, inputs):
                t, er, ec, rr, rc = inputs
                history = window_snapshot(store, t, ehlen)
                triples = store.triples[t + ehlen]
                mask = store.triple_mask[t + ehlen]
                rb = _rb_at(est, t, mask)
                s_ob, s_rel = predict_step(state, history, triples, mask, rb)
                return 0, (
                    _metrics.device_ranks(s_ob, triples[:, 2]),
                    _metrics.device_filtered_ranks(s_ob, triples[:, 2], er, ec),
                    _metrics.device_ranks(s_rel, triples[:, 1]),
                    _metrics.device_filtered_ranks(s_rel, triples[:, 1], rr, rc),
                )

            ts = jnp.arange(n_eval, dtype=jnp.int32)
            _, ranks = jax.lax.scan(
                body, 0, (ts, ent_rows, ent_cols, rel_rows, rel_cols))
            return ranks

        self.eval_fn = jax.jit(eval_fn)
        self._eval_cache: Dict = {}

    # ----------------------------------------------------------------- state
    def init_state(self, rng: jax.Array) -> HypTrainState:
        params, model_state = hmodel.init_params(rng, self.cfg, self.radius_target)
        est_state = (
            est_mod.init_est_state(self.cfg.num_ents, self.cfg.h_dim)
            if self.cfg.use_est else None
        )
        state = HypTrainState(
            params=params, opt_state=self.opt.init(params),
            model_state=model_state, est_state=est_state,
            rng=jax.random.fold_in(rng, 1), step=jnp.zeros((), jnp.int32),
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

    def _history(self, snaps, cache_key=None):
        if cache_key is not None and cache_key in self._history_cache:
            return self._history_cache[cache_key]
        h = build_history(list(snaps), self.num_nodes, self.num_rels,
                          edge_bucket=self.tc.edge_bucket, rc_bucket=self.tc.rc_bucket)
        G = self._halo_shards()
        if G:
            from regcn_tpu.dist import attach_history_halo

            h = attach_history_halo(h, snaps, self.num_nodes, self.num_rels,
                                    G, edge_bucket=self.tc.edge_bucket)
        if cache_key is not None:
            self._history_cache[cache_key] = h
        return h

    def _curvature_max(self, epoch: int) -> float:
        """Warmup schedule for the curvature upper bound (ref :528-545)."""
        cfg = self.cfg
        if not cfg.learn_curvature or self.curvature_warmup_epochs <= 0:
            return cfg.curvature_max
        if epoch >= self.curvature_warmup_epochs:
            return cfg.curvature_max
        progress = (epoch + 1) / self.curvature_warmup_epochs
        return cfg.c + (cfg.curvature_max - cfg.c) * progress

    def _retrieval(self, triples, mask, query_time: int):
        """Host-side ETNR query -> device RetrievalBatch (arrays only)."""
        if not self.cfg.use_est or self.temporal_index is None:
            return None
        nb_e, nb_r, dts, msk = self.temporal_index.query(triples[:, 0], query_time)
        return est_mod.RetrievalBatch(
            nb_ents=jnp.asarray(nb_e), nb_rels=jnp.asarray(nb_r),
            deltas=jnp.asarray(dts), event_mask=jnp.asarray(msk),
            row_mask=jnp.asarray(mask),
        )

    def _build_est_store(self, triples_all, masks_all, times,
                         with_tans: bool) -> Optional[ESTStore]:
        """Precompute per-snapshot ETNR retrieval (and TANS masks for
        training) for a whole split — identical arrays to what the
        per-step path queries, stacked [T, ...] and device-resident."""
        cfg = self.cfg
        want_est = cfg.use_est and self.temporal_index is not None
        want_tans = with_tans and cfg.use_time_aware_negative and self.true_tails is not None
        if not (want_est or want_tans):
            return None
        T, B = masks_all.shape
        out = {}
        if want_est:
            K = cfg.est_history_len
            nb_e = np.zeros((T, B, K), np.int32)
            nb_r = np.zeros((T, B, K), np.int32)
            dts = np.zeros((T, B, K), np.float32)
            msk = np.zeros((T, B, K), np.float32)
            for t in range(T):
                if masks_all[t].sum() == 0:
                    continue
                nb_e[t], nb_r[t], dts[t], msk[t] = self.temporal_index.query(
                    triples_all[t][:, 0], times[t])
            out.update(nb_ents=jnp.asarray(nb_e), nb_rels=jnp.asarray(nb_r),
                       deltas=jnp.asarray(dts), event_mask=jnp.asarray(msk))
        if want_tans:
            rcs = [
                est_mod.tans_mask_coo(triples_all[t], masks_all[t],
                                      self.true_tails, pad_bucket=512)
                for t in range(T)
            ]
            M = max(len(r) for r, _ in rcs)
            rows = np.full((T, M), B, np.int32)
            cols = np.zeros((T, M), np.int32)
            for t, (r, c) in enumerate(rcs):
                rows[t, : len(r)] = r
                cols[t, : len(c)] = c
            out.update(tans_rows=jnp.asarray(rows), tans_cols=jnp.asarray(cols))
        return ESTStore(**out)

    # ----------------------------------------------------------------- train
    def run_epoch(self, state: HypTrainState, epoch: int) -> Tuple[HypTrainState, Dict[str, float]]:
        tc, cfg = self.tc, self.cfg
        cmax = jnp.asarray(self._curvature_max(epoch), jnp.float32)
        sums = {"entity": 0.0, "relation": 0.0, "static": 0.0, "radius": 0.0}
        n = 0

        use_fused = not self.triple_batch_size
        hlen = tc.train_history_len
        idx = list(range(1, len(self.train_list)))
        random.Random(tc.seed + epoch).shuffle(idx)

        if use_fused:
            prefix = []
            full = np.asarray(idx, dtype=np.int32)
        else:
            prefix = idx
            full = np.asarray([], dtype=np.int32)

        for i in prefix:
            lo = max(0, i - hlen)
            history = self._history(self.train_list[lo:i], cache_key=(lo, i))
            triples, mask = pad_triples(self.train_list[i], self.num_rels, tc.triple_bucket)
            rb = self._retrieval(triples, mask, i)
            chunked = bool(self.triple_batch_size) and len(triples) > self.triple_batch_size
            tans = None
            # the chunked branch recomputes its own per-chunk tans masks,
            # so skip the (host-side, all-triples) computation there
            if (cfg.use_time_aware_negative and self.true_tails is not None
                    and not chunked):
                tans = est_mod.tans_mask_coo(triples, mask, self.true_tails)
                tans = (jnp.asarray(tans[0]), jnp.asarray(tans[1]))
            if chunked:
                # snapshot-inner mini-batching (ref :572-628). Default mode
                # "accumulate" is reference parity: grads SUM across chunks
                # (each chunk's loss is its own mean — no rescaling), clip
                # + optimizer step ONCE per snapshot. Mode "per_chunk"
                # steps per chunk (a different SGD trajectory; kept as an
                # explicit option). Static shapes per chunk either way.
                tb = self.triple_batch_size
                acc = None
                if self.triple_batch_mode == "accumulate":
                    acc = self.zero_grads(state.params)
                chunk_losses = []
                for s in range(0, len(triples), tb):
                    tr, mk = triples[s:s + tb], mask[s:s + tb]
                    if mk.sum() == 0:
                        continue
                    rb_c = None
                    if rb is not None:
                        rb_c = est_mod.RetrievalBatch(
                            nb_ents=rb.nb_ents[s:s + tb],
                            nb_rels=rb.nb_rels[s:s + tb],
                            deltas=rb.deltas[s:s + tb],
                            event_mask=rb.event_mask[s:s + tb],
                            row_mask=rb.row_mask[s:s + tb])
                    tans_c = None
                    if cfg.use_time_aware_negative and self.true_tails is not None:
                        tans_c = est_mod.tans_mask_coo(tr, mk, self.true_tails)
                        tans_c = (jnp.asarray(tans_c[0]), jnp.asarray(tans_c[1]))
                    if acc is not None:
                        state, acc, losses = self.accum_grad_step(
                            state, acc, history, jnp.asarray(tr),
                            jnp.asarray(mk), cmax, rb_c, tans_c)
                    else:
                        state, losses = self.train_step(
                            state, history, jnp.asarray(tr), jnp.asarray(mk),
                            cmax, rb_c, tans_c)
                    chunk_losses.append(losses)
                if acc is not None and chunk_losses:
                    state = self.apply_accumulated(state, acc)
                # log the per-snapshot average of chunk losses (ref :607-614)
                if chunk_losses:
                    host = jax.device_get(chunk_losses)
                    for k in sums:
                        sums[k] += float(np.mean([h[k] for h in host]))
                    n += 1
            else:
                state, losses = self.train_step(
                    state, history, jnp.asarray(triples), jnp.asarray(mask), cmax,
                    rb, tans)
                for k in sums:
                    sums[k] += float(losses[k])
                n += 1

        if len(full):
            if self._store is None:
                self._store = build_snapshot_store(
                    self.train_list, self.num_nodes, self.num_rels,
                    edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
                    triple_bucket=tc.triple_bucket, pad_front=hlen,
                    halo_shards=self._halo_shards(),
                )
                if self.mesh is not None:
                    from regcn_tpu.parallel.sharding import shard_snapshot_store

                    self._store = shard_snapshot_store(self._store, self.mesh)
                triples_all = np.asarray(self._store.triples[hlen:])
                masks_all = np.asarray(self._store.triple_mask[hlen:])
                self._train_est_store = self._build_est_store(
                    triples_all, masks_all, times=list(range(len(triples_all))),
                    with_tans=True,
                )
            state, loss_stack = self.epoch_fn(
                state, self._store, self._train_est_store, jnp.asarray(full), cmax)
            # ONE device->host round trip for all loss components (through
            # a remote tunnel, per-scalar float() syncs dominate otherwise)
            loss_host = jax.device_get(loss_stack)
            for k in sums:
                sums[k] += float(np.sum(loss_host[k]))
            n += len(full)

        return state, {k: v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------- analysis
    def analysis_record(self, state, epoch: int = 0) -> Dict[str, float]:
        """--run-analysis sample: gradient norms on the first full
        training window + entity embedding norms + static-radius and
        curvature stats (ref:hyperbolic_main.py:624-625,
        ref:hyperbolic_model.py:851-882 — per-epoch instead of the
        reference's every-100-snapshots, which the fused epoch precludes)."""
        from regcn_tpu.utils.profiling import embedding_stats, gradient_stats

        tc, cfg = self.tc, self.cfg
        i = min(tc.train_history_len, len(self.train_list) - 1)
        lo = max(0, i - tc.train_history_len)
        history = self._history(self.train_list[lo:i], cache_key=(lo, i))
        triples, mask = pad_triples(self.train_list[i], self.num_rels,
                                    tc.triple_bucket)
        rb = self._retrieval(triples, mask, i)
        est_inputs = (state.est_state, rb) if (cfg.use_est and rb is not None) else None
        cmax = jnp.asarray(self._curvature_max(epoch), jnp.float32)
        if self._analysis_grad is None:
            self._analysis_grad = jax.jit(
                jax.grad(self._loss_fn, has_aux=True))
        grads, _ = self._analysis_grad(
            state.params, state.model_state, history, jnp.asarray(triples),
            jnp.asarray(mask), jax.random.PRNGKey(0), cmax, est_inputs, None)
        rec = gradient_stats(grads)
        rec.update(embedding_stats(state.params["dynamic_emb"], "entity"))
        radius = np.asarray(jax.device_get(state.params["radius_static"]))
        rec["radius_static_mean"] = float(radius.mean())
        rec["radius_static_std"] = float(radius.std())
        rec["curvature"] = float(jax.device_get(
            hmodel.get_curvature(state.params, cfg, cmax)))
        return rec

    # ------------------------------------------------------------------ eval
    def evaluate_fused(self, state, history_list, eval_list, ent_filters=None,
                       rel_filters=None, time_offset: int = 0, cache_key=None):
        """Whole-split rolling-window evaluation as ONE device call."""
        from regcn_tpu.train.epoch import build_eval_store, stack_eval_filters

        tc = self.tc
        hlen = tc.test_history_len
        if cache_key is not None and cache_key in self._eval_cache:
            store, est, er, ec, rr, rc, tmask = self._eval_cache[cache_key]
        else:
            store = build_eval_store(
                history_list, eval_list, self.num_nodes, self.num_rels, hlen,
                edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
                triple_bucket=tc.triple_bucket,
                halo_shards=self._halo_shards(),
            )
            if self.mesh is not None:
                from regcn_tpu.parallel.sharding import shard_snapshot_store

                store = shard_snapshot_store(store, self.mesh)
            er, ec = stack_eval_filters(ent_filters, eval_list, self.num_rels,
                                        tc.triple_bucket, rel_mode=False)
            rr, rc = stack_eval_filters(rel_filters, eval_list, self.num_rels,
                                        tc.triple_bucket, rel_mode=True)
            tmask = np.asarray(store.triple_mask)[hlen:] > 0  # [T, B] host
            est = self._build_est_store(
                np.asarray(store.triples[hlen:]), np.asarray(store.triple_mask[hlen:]),
                times=[time_offset + t for t in range(len(eval_list))],
                with_tans=False,
            )
            if cache_key is not None:
                self._eval_cache[cache_key] = (store, est, er, ec, rr, rc, tmask)
        ranks = jax.device_get(self.eval_fn(state, store, est, er, ec, rr, rc))
        out = {}
        for key, arr in zip(("ent_raw", "ent_filter", "rel_raw", "rel_filter"),
                            ranks):
            out[key] = metrics.stat_ranks(
                [arr[t][tmask[t]] for t in range(arr.shape[0])]
            )
        return out

    def evaluate(self, state, history_list, eval_list, ent_filters=None,
                 rel_filters=None, time_offset: int = 0,
                 multi_step: bool = False, topk: int = 10,
                 relation_evaluation: bool = False, cache_key=None):
        # multi-step under dist_agg='halo': the per-step host loop below
        # rebuilds each window through self._history, which attaches the
        # boundary-halo partition of every snapshot INCLUDING the
        # synthetic predicted ones (one build_halo_store call per window)
        if not multi_step and self.eval_fn is not None:
            return self.evaluate_fused(state, history_list, eval_list,
                                       ent_filters, rel_filters,
                                       time_offset=time_offset,
                                       cache_key=cache_key)
        tc = self.tc
        window = list(history_list[-tc.test_history_len:])
        ranks = {"ent_raw": [], "ent_filter": [], "rel_raw": [], "rel_filter": []}
        for t, snap in enumerate(eval_list):
            history = self._history(window)
            triples, mask = pad_triples(snap, self.num_rels, tc.triple_bucket)
            rb = self._retrieval(triples, mask, time_offset + t)
            valid = mask > 0
            if multi_step:
                # feed top-k predictions back into the window (ref baseline
                # multi-step; needs the dense scores on host)
                from regcn_tpu.train.loop import construct_snap, construct_snap_r
                from regcn_tpu.train import metrics as _m

                s_ob, s_rel = self.predict_step(
                    state, history, jnp.asarray(triples), jnp.asarray(mask), rb)
                s_ob = np.asarray(s_ob, np.float64)[valid]
                s_rel = np.asarray(s_rel, np.float64)[valid]
                tq = triples[valid]
                ranks["ent_raw"].append(_m.ranks_from_scores(s_ob, tq[:, 2]))
                ranks["ent_filter"].append(_m.filtered_ranks(
                    s_ob, tq[:, [0, 1]], tq[:, 2],
                    ent_filters[t] if ent_filters else None))
                ranks["rel_raw"].append(_m.ranks_from_scores(s_rel, tq[:, 1]))
                ranks["rel_filter"].append(_m.filtered_ranks(
                    s_rel, tq[:, [0, 2]], tq[:, 1],
                    rel_filters[t] if rel_filters else None))
                # relation mode feeds predicted-relation snapshots instead
                # (ref:hyperbolic_main.py:135-142)
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
                state, history, jnp.asarray(triples), jnp.asarray(mask),
                jnp.asarray(er), jnp.asarray(ec), jnp.asarray(rr), jnp.asarray(rc), rb)
            ranks["ent_raw"].append(np.asarray(r1)[valid])
            ranks["ent_filter"].append(np.asarray(r2)[valid])
            ranks["rel_raw"].append(np.asarray(r3)[valid])
            ranks["rel_filter"].append(np.asarray(r4)[valid])
            window.pop(0)
            window.append(snap)
        return {k: metrics.stat_ranks(v) for k, v in ranks.items()}

    # ------------------------------------------------------------------- fit
    def fit(self, state=None, n_epochs=None, patience: int = 20,
            checkpoint_path=None, resume: bool = False,
            selection_metric: str = "ent_raw"):
        """Training with early stopping (ref :509, :679-681).

        ``resume=True``: restore the full state (params + optimizer +
        EST buffers + epoch) from ``checkpoint_path`` and continue.
        ``selection_metric``: "ent_raw" (default) or "rel_raw" — the
        reference's --relation-evaluation best-checkpoint selection
        (ref:hyperbolic_main.py:672)."""
        tc = self.tc
        if selection_metric not in ("ent_raw", "rel_raw"):
            raise ValueError(
                f"selection_metric must be 'ent_raw' or 'rel_raw', got "
                f"{selection_metric!r}")
        if state is None:
            state = self.init_state(jax.random.PRNGKey(tc.seed))
        n_epochs = n_epochs or tc.n_epochs
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

        # patience counter survives resume: epochs since the best epoch
        best_state = _copy(state)
        bad_epochs = max(0, start_epoch - 1 - best_epoch) if best_epoch >= 0 else 0
        history_rows = []
        for epoch in range(start_epoch, n_epochs):
            t0 = time.time()
            state, losses = self.run_epoch(state, epoch)
            dt = time.time() - t0
            stats = self.evaluate(state, self.train_list, self.valid_list,
                                  ent_f, rel_f, time_offset=len(self.train_list),
                                  cache_key="valid")
            mrr = stats[selection_metric].mrr
            row = {"epoch": epoch, "losses": losses,
                   "valid_mrr_raw": stats["ent_raw"].mrr, "epoch_time_s": dt}
            if self.run_analysis:
                row["analysis"] = rec = self.analysis_record(state, epoch)
                log.info("analysis %03d | grad global %.4e | ent norm "
                         "%.3f±%.3f | radius %.3f±%.3f | c %.5f",
                         epoch, rec["global_norm"], rec["entity_norm_mean"],
                         rec["entity_norm_std"], rec["radius_static_mean"],
                         rec["radius_static_std"], rec["curvature"])
            history_rows.append(row)
            log.info("epoch %03d | e/r/s/rad %.4f/%.4f/%.4f/%.4f | %s MRR %.4f | %.1fs",
                     epoch, losses["entity"], losses["relation"], losses["static"],
                     losses["radius"], selection_metric, mrr, dt)
            if mrr > best_mrr:
                # deep copy: the next epoch donates `state`'s buffers
                from regcn_tpu.train.state import copy_state

                best_mrr, best_state, bad_epochs = mrr, copy_state(state), 0
                best_epoch = epoch
                if checkpoint_path:
                    from regcn_tpu.train.state import save_checkpoint

                    save_checkpoint(checkpoint_path, state, {"epoch": epoch, "mrr": mrr})
            else:
                bad_epochs += 1
            if checkpoint_path:
                from regcn_tpu.train.state import save_last_checkpoint

                save_last_checkpoint(checkpoint_path, state, epoch,
                                     best_mrr, best_epoch)
            if bad_epochs >= patience:
                log.info("early stop at epoch %d (patience %d)", epoch, patience)
                break
        if checkpoint_path:
            from regcn_tpu.train.state import wait_for_checkpoints

            wait_for_checkpoints()  # commit in-flight async saves
        return best_state, {"best_valid_mrr_raw": best_mrr,
                            "selection_metric": selection_metric,
                            "history": history_rows}

    def test(self, state, multi_step: bool = False, topk: int = 10,
             relation_evaluation: bool = False):
        """Test-split evaluation; ``multi_step``/``topk``/
        ``relation_evaluation`` mirror the reference's hyperbolic test
        entry (ref:hyperbolic_main.py:135-142)."""
        ent_f = build_answer_filters_by_time(self.data.test, self.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.test, self.num_rels, True)
        return self.evaluate(
            state, self.train_list + self.valid_list, self.test_list, ent_f, rel_f,
            time_offset=len(self.train_list) + len(self.valid_list),
            multi_step=multi_step, topk=topk,
            relation_evaluation=relation_evaluation,
            cache_key="test",
        )
