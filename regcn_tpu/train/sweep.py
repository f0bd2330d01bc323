"""Vectorized hyperparameter sweep: K configurations in ONE program.

The reference's grid search retrains sequentially per combination
(ref:src/main.py:403-443). On TPU, numeric hyperparameters that do not
change tensor shapes — learning rate, task weight, seed — can instead be
``vmap``-ed over a model axis: K models train simultaneously inside the
same fused whole-epoch scan, turning many small kernels into batched
ones (better MXU/HBM utilization than K sequential runs, plus a single
compilation).

- learning rate rides in the optimizer state via
  ``optax.inject_hyperparams`` so each model slice carries its own;
- task weight enters the loss as a traced scalar;
- seeds vmap through the PRNG keys (free ensembling).

Shape-changing knobs (n_hidden, n_layers, dropout rates, n_bases) still
sweep sequentially — combine both by calling this per outer combo.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regcn_tpu.config import ModelConfig, TrainConfig
from regcn_tpu.models import recurrent
from regcn_tpu.train import metrics
from regcn_tpu.train.epoch import SnapshotStore, window_snapshot
from regcn_tpu.train.state import TrainState


def _sweep_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_norm),
        optax.add_decayed_weights(tc.weight_decay),
        optax.inject_hyperparams(optax.adam)(learning_rate=tc.lr),
    )


def _set_learning_rates(opt_state, lrs: jax.Array):
    """Write per-model learning rates into the vmapped optimizer state."""

    def replace(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if "learning_rate" in names:
            return jnp.broadcast_to(lrs, leaf.shape).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(replace, opt_state)


def model_axis_shardings(tree, mesh):
    """NamedSharding pytree for a vmap-stacked state: the leading model
    axis of every array leaf is sharded over the ``data`` mesh axis
    (models are independent, so the sweep scales embarrassingly —
    no collectives beyond the stacked-loss gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from regcn_tpu.parallel.mesh import DATA_AXIS

    def rule(leaf):
        nd = getattr(leaf, "ndim", 0)
        if nd >= 1:
            return NamedSharding(mesh, P(DATA_AXIS, *([None] * (nd - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def make_sweep(
    cfg: ModelConfig,
    tc: TrainConfig,
    n_models: int,
    static_snap=None,
    impl: str = "xla",
    pad_front: int = 0,
    mesh=None,
):
    """Returns (init_fn, epoch_fn, eval_fn) for a K-model vectorized sweep.

    init_fn(seeds [K], lrs [K]) -> stacked TrainState
    epoch_fn(states, store, order, task_weights [K]) -> (states, losses [K, S])
    eval_fn(states, store, ent_rows, ent_cols, rel_rows, rel_cols)
        -> 4 x [K, T, B] rank arrays

    With ``mesh``, the model axis is sharded over the ``data`` mesh axis
    (K must be divisible by its size): K models train simultaneously
    ACROSS chips as well as within the batched kernels.
    """
    opt = _sweep_optimizer(tc)
    hlen = tc.train_history_len

    def constrain_models(states):
        if mesh is None:
            return states
        return jax.lax.with_sharding_constraint(
            states, model_axis_shardings(states, mesh))

    def loss_fn(params, model_state, history, triples, mask, rng, tw):
        _, losses, new_state = recurrent.get_loss(
            params, model_state, cfg, history, triples, mask,
            static_snap=static_snap, rng=rng, train=True, impl=impl,
        )
        total = (tw * losses["entity"] + (1.0 - tw) * losses["relation"]
                 + losses["static"])
        return total, (losses, new_state)

    def one_step(state: TrainState, history, triples, mask, tw):
        rng, step_rng = jax.random.split(state.rng)
        grads, (losses, new_model_state) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.model_state, history, triples, mask,
            step_rng, tw,
        )
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(
            params=new_params, opt_state=new_opt_state,
            model_state=new_model_state, rng=rng, step=state.step + 1,
        ), losses

    def epoch_fn(states, store: SnapshotStore, order, task_weights):
        def body(sts, i):
            history = window_snapshot(store, i - hlen + pad_front, hlen)
            triples = store.triples[i + pad_front]
            mask = store.triple_mask[i + pad_front]
            new_sts, losses = jax.vmap(one_step, in_axes=(0, None, None, None, 0))(
                sts, history, triples, mask, task_weights)
            return constrain_models(new_sts), losses

        return jax.lax.scan(body, states, order)

    def init_fn(seeds: Sequence[int], lrs: Sequence[float]):
        from regcn_tpu.train.state import create_train_state

        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        states = jax.vmap(lambda k: _retie_opt(create_train_state(k, cfg, tc)))(keys)
        return dataclass_replace(
            states,
            opt_state=_set_learning_rates(
                states.opt_state, jnp.asarray(np.asarray(lrs, np.float32))),
        )

    def _retie_opt(state: TrainState) -> TrainState:
        # create_train_state builds the plain optimizer; re-init with the
        # hyperparam-injected one so learning_rate lives in the state
        return dataclass_replace(state, opt_state=opt.init(state.params))

    ehlen = tc.test_history_len

    def eval_fn(states, store: SnapshotStore, ent_rows, ent_cols,
                rel_rows, rel_cols):
        def one_predict(state, history, triples, mask):
            return recurrent.predict(
                state.params, state.model_state, cfg, history, triples, mask,
                static_snap=static_snap, impl=impl,
            )

        def body(_, inputs):
            t, er, ec, rr, rc = inputs
            history = window_snapshot(store, t, ehlen)
            triples = store.triples[t + ehlen]
            mask = store.triple_mask[t + ehlen]
            s_ob, s_rel = jax.vmap(one_predict, in_axes=(0, None, None, None))(
                states, history, triples, mask)
            rank = jax.vmap(metrics.device_ranks, in_axes=(0, None))
            frank = jax.vmap(metrics.device_filtered_ranks, in_axes=(0, None, None, None))
            return 0, (
                rank(s_ob, triples[:, 2]),
                frank(s_ob, triples[:, 2], er, ec),
                rank(s_rel, triples[:, 1]),
                frank(s_rel, triples[:, 1], rr, rc),
            )

        ts = jnp.arange(ent_rows.shape[0], dtype=jnp.int32)
        _, ranks = jax.lax.scan(
            body, 0, (ts, ent_rows, ent_cols, rel_rows, rel_cols))
        # [T, K, B] -> [K, T, B]
        return tuple(jnp.swapaxes(r, 0, 1) for r in ranks)

    return init_fn, jax.jit(epoch_fn, donate_argnums=(0,)), jax.jit(eval_fn)


def dataclass_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


class SweepRunner:
    """Drives a vectorized (lr, task_weight, seed) sweep end-to-end."""

    def __init__(self, cfg: ModelConfig, tc: TrainConfig, data,
                 combos: Dict[str, Sequence], impl: str = "xla", mesh=None):
        from regcn_tpu.data.snapshots import split_by_time
        from regcn_tpu.train.epoch import build_snapshot_store

        self.cfg, self.tc, self.data = cfg, tc, data
        self.mesh = mesh
        ks = set(combos) - {"lr", "task_weight", "seed"}
        if ks:
            raise ValueError(f"not vectorizable (shape-changing): {sorted(ks)}")
        n = max(len(v) for v in combos.values())
        self.lrs = list(combos.get("lr", [tc.lr] * n))
        self.tws = list(combos.get("task_weight", [tc.task_weight] * n))
        self.seeds = list(combos.get("seed", [tc.seed] * n))
        n = max(len(self.lrs), len(self.tws), len(self.seeds))
        for lst, default in ((self.lrs, self.lrs[-1]), (self.tws, self.tws[-1]),
                             (self.seeds, self.seeds[-1])):
            lst.extend([default] * (n - len(lst)))
        self.n_models = n

        self.train_list = split_by_time(data.train)
        self.valid_list = split_by_time(data.valid)
        hlen = tc.train_history_len
        self.store = build_snapshot_store(
            self.train_list, data.num_nodes, data.num_rels,
            edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
            triple_bucket=tc.triple_bucket, pad_front=hlen,
        )
        if mesh is not None:
            from regcn_tpu.parallel.mesh import DATA_AXIS

            d = mesh.shape[DATA_AXIS]
            if n % d != 0:
                raise ValueError(
                    f"{n} sweep models not divisible by the '{DATA_AXIS}' "
                    f"mesh axis ({d}); pad the combo list to "
                    f"{((n + d - 1) // d) * d}")
        self.init_fn, self.epoch_fn, self.eval_fn = make_sweep(
            cfg, tc, n, pad_front=hlen, impl=impl, mesh=mesh)

    def run(self, n_epochs: Optional[int] = None):
        """Train all models; returns per-model valid MRR + loss history."""
        import random as _random

        from regcn_tpu.data.answers import build_answer_filters_by_time
        from regcn_tpu.train.epoch import build_eval_store, stack_eval_filters

        tc = self.tc
        states = self.init_fn(self.seeds, self.lrs)
        if self.mesh is not None:
            states = jax.device_put(
                states, model_axis_shardings(states, self.mesh))
        tws = jnp.asarray(np.asarray(self.tws, np.float32))
        n_epochs = n_epochs or tc.n_epochs
        for epoch in range(n_epochs):
            idx = list(range(1, len(self.train_list)))
            _random.Random(tc.seed + epoch).shuffle(idx)
            states, losses = self.epoch_fn(
                states, self.store, jnp.asarray(np.asarray(idx, np.int32)), tws)

        ent_f = build_answer_filters_by_time(self.data.valid, self.data.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.valid, self.data.num_rels, True)
        estore = build_eval_store(
            self.train_list, self.valid_list, self.data.num_nodes,
            self.data.num_rels, tc.test_history_len,
            edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
            triple_bucket=tc.triple_bucket,
        )
        er, ec = stack_eval_filters(ent_f, self.valid_list, self.data.num_rels,
                                    tc.triple_bucket, rel_mode=False)
        rr, rc = stack_eval_filters(rel_f, self.valid_list, self.data.num_rels,
                                    tc.triple_bucket, rel_mode=True)
        ranks = jax.device_get(self.eval_fn(states, estore, er, ec, rr, rc))
        tmask = np.asarray(estore.triple_mask)[tc.test_history_len:] > 0
        out = []
        for k in range(self.n_models):
            stats = {
                key: metrics.stat_ranks(
                    [arr[k][t][tmask[t]] for t in range(arr.shape[1])])
                for key, arr in zip(
                    ("ent_raw", "ent_filter", "rel_raw", "rel_filter"), ranks)
            }
            out.append({
                "lr": float(self.lrs[k]), "task_weight": float(self.tws[k]),
                "seed": int(self.seeds[k]),
                "valid_ent_mrr_raw": stats["ent_raw"].mrr,
                "stats": stats,
            })
        return out, states


# ----------------------------------------------------------- hyperbolic

class HyperbolicSweepRunner:
    """Vectorized (lr, task_weight, seed) sweep for the hyperbolic model
    (non-EST, Euclidean-optimizer configurations; manifold entities need
    per-model Riemannian state and sweep sequentially)."""

    def __init__(self, cfg, tc: TrainConfig, data, combos: Dict[str, Sequence]):
        from regcn_tpu.data.snapshots import split_by_time
        from regcn_tpu.hyperbolic import model as hmodel
        from regcn_tpu.train.epoch import build_snapshot_store

        if cfg.manifold_entities or cfg.use_est:
            raise ValueError("vectorized sweep supports the Euclidean-"
                             "optimizer, non-EST hyperbolic configurations")
        ks = set(combos) - {"lr", "task_weight", "seed"}
        if ks:
            raise ValueError(f"not vectorizable (shape-changing): {sorted(ks)}")
        self.cfg, self.tc, self.data = cfg, tc, data
        n = max(len(v) for v in combos.values())
        self.lrs = list(combos.get("lr", [tc.lr] * n))
        self.tws = list(combos.get("task_weight", [tc.task_weight] * n))
        self.seeds = list(combos.get("seed", [tc.seed] * n))
        n = max(len(self.lrs), len(self.tws), len(self.seeds))
        for lst in (self.lrs, self.tws, self.seeds):
            lst.extend([lst[-1]] * (n - len(lst)))
        self.n_models = n

        self.train_list = split_by_time(data.train)
        self.valid_list = split_by_time(data.valid)
        hlen = tc.train_history_len
        self.store = build_snapshot_store(
            self.train_list, data.num_nodes, data.num_rels,
            edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
            triple_bucket=tc.triple_bucket, pad_front=hlen,
        )
        from regcn_tpu.hyperbolic.train import compute_radius_targets

        self.radius_target = compute_radius_targets(
            self.train_list, data.num_nodes,
            alpha=cfg.radius_alpha, beta=cfg.radius_beta,
            radius_min=cfg.radius_min, radius_max=cfg.radius_max,
        )

        opt = optax.chain(
            optax.clip_by_global_norm(tc.grad_norm),
            optax.add_decayed_weights(tc.weight_decay),
            optax.inject_hyperparams(optax.adam)(learning_rate=tc.lr),
        )
        self.opt = opt

        def loss_fn(params, model_state, history, triples, mask, rng, tw):
            _, losses, new_state, _ = hmodel.get_loss(
                params, model_state, cfg, history, triples, mask,
                rng=rng, train=True,
            )
            total = (tw * losses["entity"] + (1.0 - tw) * losses["relation"]
                     + losses["static"] + losses["radius"])
            return total, (losses, new_state)

        def one_step(state, history, triples, mask, tw):
            rng, step_rng = jax.random.split(state.rng)
            grads, (losses, new_ms) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.model_state, history, triples, mask,
                step_rng, tw)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return dataclass_replace(
                state, params=new_params, opt_state=new_opt,
                model_state=new_ms, rng=rng, step=state.step + 1), losses

        def epoch_fn(states, store, order, tws):
            def body(sts, i):
                history = window_snapshot(store, i, hlen)
                triples = store.triples[i + hlen]
                mask = store.triple_mask[i + hlen]
                return jax.vmap(one_step, in_axes=(0, None, None, None, 0))(
                    sts, history, triples, mask, tws)

            return jax.lax.scan(body, states, order)

        self.epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))

        ehlen = tc.test_history_len

        def eval_fn(states, store, ent_rows, ent_cols, rel_rows, rel_cols):
            def one_predict(state, history, triples, mask):
                return hmodel.predict(state.params, state.model_state, cfg,
                                      history, triples, mask)

            def body(_, inputs):
                t, er, ec, rr, rc = inputs
                history = window_snapshot(store, t, ehlen)
                triples = store.triples[t + ehlen]
                mask = store.triple_mask[t + ehlen]
                s_ob, s_rel = jax.vmap(one_predict, in_axes=(0, None, None, None))(
                    states, history, triples, mask)
                rank = jax.vmap(metrics.device_ranks, in_axes=(0, None))
                frank = jax.vmap(metrics.device_filtered_ranks,
                                 in_axes=(0, None, None, None))
                return 0, (
                    rank(s_ob, triples[:, 2]),
                    frank(s_ob, triples[:, 2], er, ec),
                    rank(s_rel, triples[:, 1]),
                    frank(s_rel, triples[:, 1], rr, rc),
                )

            ts = jnp.arange(ent_rows.shape[0], dtype=jnp.int32)
            _, ranks = jax.lax.scan(
                body, 0, (ts, ent_rows, ent_cols, rel_rows, rel_cols))
            return tuple(jnp.swapaxes(r, 0, 1) for r in ranks)

        self.eval_fn = jax.jit(eval_fn)

    def _init_states(self):
        from regcn_tpu.hyperbolic import model as hmodel
        from regcn_tpu.hyperbolic.train import HypTrainState

        def one(key):
            params, ms = hmodel.init_params(key, self.cfg, self.radius_target)
            return HypTrainState(
                params=params, opt_state=self.opt.init(params),
                model_state=ms, est_state=None,
                rng=jax.random.fold_in(key, 1),
                step=jnp.zeros((), jnp.int32))

        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in self.seeds])
        states = jax.vmap(one)(keys)
        return dataclass_replace(
            states,
            opt_state=_set_learning_rates(
                states.opt_state, jnp.asarray(np.asarray(self.lrs, np.float32))))

    def run(self, n_epochs: Optional[int] = None):
        import random as _random

        from regcn_tpu.data.answers import build_answer_filters_by_time
        from regcn_tpu.train.epoch import build_eval_store, stack_eval_filters

        tc = self.tc
        states = self._init_states()
        tws = jnp.asarray(np.asarray(self.tws, np.float32))
        for epoch in range(n_epochs or tc.n_epochs):
            idx = list(range(1, len(self.train_list)))
            _random.Random(tc.seed + epoch).shuffle(idx)
            states, _ = self.epoch_fn(
                states, self.store, jnp.asarray(np.asarray(idx, np.int32)), tws)

        ent_f = build_answer_filters_by_time(self.data.valid, self.data.num_rels, False)
        rel_f = build_answer_filters_by_time(self.data.valid, self.data.num_rels, True)
        estore = build_eval_store(
            self.train_list, self.valid_list, self.data.num_nodes,
            self.data.num_rels, tc.test_history_len,
            edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
            triple_bucket=tc.triple_bucket)
        er, ec = stack_eval_filters(ent_f, self.valid_list, self.data.num_rels,
                                    tc.triple_bucket, rel_mode=False)
        rr, rc = stack_eval_filters(rel_f, self.valid_list, self.data.num_rels,
                                    tc.triple_bucket, rel_mode=True)
        ranks = jax.device_get(self.eval_fn(states, estore, er, ec, rr, rc))
        tmask = np.asarray(estore.triple_mask)[tc.test_history_len:] > 0
        out = []
        for k in range(self.n_models):
            stats = {
                key: metrics.stat_ranks(
                    [arr[k][t][tmask[t]] for t in range(arr.shape[1])])
                for key, arr in zip(
                    ("ent_raw", "ent_filter", "rel_raw", "rel_filter"), ranks)
            }
            out.append({
                "lr": float(self.lrs[k]), "task_weight": float(self.tws[k]),
                "seed": int(self.seeds[k]),
                "valid_ent_mrr_raw": stats["ent_raw"].mrr,
                "stats": stats,
            })
        return out, states
