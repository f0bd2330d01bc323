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
                 his_edge_bucket: int = 4096, his_max_edges: Optional[int] = 65536):
        self.cfg = cfg
        self.tc = tc
        self.data = data
        self.num_rels = data.num_rels
        self.num_nodes = data.num_nodes
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
            self.num_nodes, self.num_rels, history_len=tc.train_history_len
        ).build(self.all_list)

        self.opt = make_optimizer(tc)
        self._history_cache: Dict = {}
        self._build_steps()

    def _build_steps(self):
        cfg, tc, opt = self.cfg, self.tc, self.opt

        def loss_fn(params, model_state, history, history_gg, triples, inv_triples,
                    mask, hg_raw, hg_inv, rel_vocab, rng):
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
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                HisResTrainState(params=new_params, opt_state=new_opt,
                                 model_state=new_model_state, rng=rng,
                                 step=state.step + 1),
                losses,
            )

        self.train_step = jax.jit(train_step, donate_argnums=(0,))

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

    def init_state(self, rng: jax.Array) -> HisResTrainState:
        params, model_state = hmodel.init_params(rng, self.cfg)
        return HisResTrainState(
            params=params, opt_state=self.opt.init(params),
            model_state=model_state, rng=jax.random.fold_in(rng, 7),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------ data
    def _history(self, snaps, key=None):
        cache_key = ("h",) + key if key is not None else None
        if cache_key and cache_key in self._history_cache:
            return self._history_cache[cache_key]
        h = build_history(list(snaps), self.num_nodes, self.num_rels,
                          edge_bucket=self.tc.edge_bucket, rc_bucket=self.tc.rc_bucket)
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
    def run_epoch(self, state, epoch: int):
        tc = self.tc
        idx = list(range(1, len(self.train_list)))
        random.Random(tc.seed + epoch).shuffle(idx)
        sums = {"entity": 0.0, "relation": 0.0, "static": 0.0}
        n = 0
        for i in idx:
            lo = max(0, i - tc.train_history_len)
            window = self.train_list[lo:i]
            history = self._history(window, key=(lo, i))
            history_gg = self._history(union_snapshots(window), key=(lo, i, "gg"))
            raw, inv, mask, hg_raw, hg_inv, rel_vocab = self._batch(self.train_list[i], i)
            state, losses = self.train_step(
                state, history, history_gg, raw, inv, mask, hg_raw, hg_inv, rel_vocab)
            for k in sums:
                sums[k] += float(losses[k])
            n += 1
        return state, {k: v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------ eval
    def evaluate(self, state, history_list, eval_list, ent_filters=None,
                 rel_filters=None, time_offset: int = 0):
        tc = self.tc
        window = list(history_list[-tc.test_history_len:])
        ranks = {"ent_raw": [], "ent_filter": [], "rel_raw": [], "rel_filter": []}
        for t, snap in enumerate(eval_list):
            history = self._history(window)
            history_gg = self._history(union_snapshots(window))
            raw, inv, mask, hg_raw, hg_inv, rel_vocab = self._batch(snap, time_offset + t)
            mask_np = np.asarray(mask)
            allq = np.concatenate([np.asarray(raw), np.asarray(inv)])
            allm = np.concatenate([mask_np, mask_np]) > 0
            er, ec = metrics.filter_coo_padded(
                ent_filters[t] if ent_filters else None, allq[:, [0, 1]], allq[:, 2])
            rr, rc = metrics.filter_coo_padded(
                rel_filters[t] if rel_filters else None, allq[:, [0, 2]], allq[:, 1])
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

    def fit(self, state=None, checkpoint_path=None):
        tc = self.tc
        if state is None:
            state = self.init_state(jax.random.PRNGKey(tc.seed))
        ent_f = build_answer_filters_by_time(self.data.valid, self.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.valid, self.num_rels, True)
        best_mrr, best_state = 0.0, state
        for epoch in range(tc.n_epochs):
            t0 = time.time()
            state, losses = self.run_epoch(state, epoch)
            stats = self.evaluate(state, self.train_list, self.valid_list,
                                  ent_f, rel_f, time_offset=len(self.train_list))
            mrr = stats["ent_raw"].mrr
            log.info("epoch %03d | e/r/s %.4f/%.4f/%.4f | MRR %.4f | %.1fs",
                     epoch, losses["entity"], losses["relation"], losses["static"],
                     mrr, time.time() - t0)
            if mrr > best_mrr:
                best_mrr, best_state = mrr, state
                if checkpoint_path:
                    from regcn_tpu.train.state import save_checkpoint

                    save_checkpoint(checkpoint_path, state, {"epoch": epoch, "mrr": mrr})
        return best_state, {"best_valid_mrr_raw": best_mrr}

    def test(self, state):
        ent_f = build_answer_filters_by_time(self.data.test, self.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.test, self.num_rels, True)
        return self.evaluate(
            state, self.train_list + self.valid_list, self.test_list,
            ent_f, rel_f,
            time_offset=len(self.train_list) + len(self.valid_list),
        )
