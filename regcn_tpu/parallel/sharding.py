"""Sharding rules + sharded train/eval steps (GSPMD path).

Design (new — the reference is single-GPU only, SURVEY.md §2.5):

- the entity axis is the big axis (N up to millions): the entity
  embedding table, evolved entity states, optimizer moments for them and
  the decoder candidate axis are sharded over the ``graph`` mesh axis;
- relation tables, GRU/decoder weights are small -> replicated;
- activations: the per-snapshot entity state ``h [N, d]`` carries a
  ``P(graph, None)`` sharding constraint through the scan so XLA keeps
  the RGCN gather/scatter and the decoder candidate GEMM shard-local and
  inserts all-gathers only at the (src-gather) halo boundary;
- entity CE loss: scores ``[B, N]`` are sharded on the candidate axis;
  logsumexp reduces with a ``psum`` XLA inserts automatically.

This GSPMD formulation is the correctness/scaling baseline; the
shard_map + Pallas halo-exchange kernel (explicitly overlapping boundary
entity exchange with local aggregation) is the later performance path.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from regcn_tpu.config import ModelConfig, TrainConfig
from regcn_tpu.models import recurrent
from regcn_tpu.parallel.mesh import GRAPH_AXIS
from regcn_tpu.train.state import TrainState, create_train_state, make_optimizer

# parameter leaves sharded over the entity axis (row-sharded)
_ENTITY_SHARDED = ("dynamic_emb", "words_emb")


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
    return tuple(names)


def param_sharding_rules(tree: Any, mesh: Mesh):
    """NamedSharding pytree: entity tables row-sharded, rest replicated.

    Works for params and for optimizer states that mirror the param tree
    (adam mu/nu), because matching is by path-component name.
    """

    def rule(path, leaf):
        names = _path_names(path)
        spec = P()
        if any(n in _ENTITY_SHARDED for n in names) and getattr(leaf, "ndim", 0) >= 1:
            spec = P(GRAPH_AXIS, *([None] * (leaf.ndim - 1)))
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, tree)


def shard_params(tree: Any, mesh: Mesh):
    return jax.device_put(tree, param_sharding_rules(tree, mesh))


def make_sharded_train_step(
    cfg: ModelConfig,
    tc: TrainConfig,
    mesh: Mesh,
    static_snap=None,
    impl: str = "xla",
):
    """Returns (init_fn, train_step, predict_step) jitted over the mesh."""
    opt = make_optimizer(tc)
    repl = NamedSharding(mesh, P())
    ent_rows = NamedSharding(mesh, P(GRAPH_AXIS, None))

    def constrain_h(h):
        return jax.lax.with_sharding_constraint(h, ent_rows)

    def loss_fn(params, model_state, history, triples, mask, rng):
        loss_ent, losses, new_state = recurrent.get_loss(
            params, model_state, cfg, history, triples, mask,
            static_snap=static_snap, rng=rng, train=True, impl=impl,
        )
        total = (
            tc.task_weight * losses["entity"]
            + (1.0 - tc.task_weight) * losses["relation"]
            + losses["static"]
        )
        return total, (losses, new_state)

    def train_step(state: TrainState, history, triples, mask):
        rng, step_rng = jax.random.split(state.rng)
        grads, (losses, new_model_state) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.model_state, history, triples, mask, step_rng
        )
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_params["dynamic_emb"] = constrain_h(new_params["dynamic_emb"])
        return (
            TrainState(
                params=new_params,
                opt_state=new_opt_state,
                model_state=new_model_state,
                rng=rng,
                step=state.step + 1,
            ),
            losses,
        )

    def init_fn(rng):
        state = create_train_state(rng, cfg, tc)
        shardings = state_sharding_rules(state, mesh)
        return jax.device_put(state, shardings)

    def predict_step(state: TrainState, history, triples, mask):
        return recurrent.predict(
            state.params, state.model_state, cfg, history, triples, mask,
            static_snap=static_snap, impl=impl,
        )

    with mesh:
        train_step_jit = jax.jit(train_step, donate_argnums=(0,))
        predict_step_jit = jax.jit(predict_step)
    return init_fn, train_step_jit, predict_step_jit


def state_sharding_rules(state: TrainState, mesh: Mesh):
    """Sharding for the full TrainState (params + optimizer moments)."""
    return param_sharding_rules(state, mesh)


def shard_snapshot_store(store, mesh: Mesh):
    """Place a SnapshotStore on the mesh: per-snapshot [S, N] degree-norm
    tables are sharded over the entity axis (they are the only O(S*N)
    arrays); edge/triple arrays are small and replicated."""
    repl = NamedSharding(mesh, P())
    ent_cols = NamedSharding(mesh, P(None, GRAPH_AXIS))

    def place(path, leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return leaf
        names = _path_names(path)
        if "halo" in names and leaf.ndim >= 2:
            # stacked halo fields are [S, G, ...]: shard the per-shard
            # axis over ``graph`` so the shard_map body reads its own
            # slice locally (send_idx [S, G, G, P] is owner-sharded)
            spec = P(None, GRAPH_AXIS, *([None] * (leaf.ndim - 2)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        sh = ent_cols if any(n in ("in_deg_norm", "has_in_edge") for n in names) else repl
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, store)


def make_sharded_epoch_fn(
    cfg: ModelConfig,
    tc: TrainConfig,
    mesh: Mesh,
    static_snap=None,
    impl: str = "xla",
    pad_front: int = 0,
    agg: str = "gspmd",
):
    """Fused whole-epoch scan (train/epoch.py execution model) jitted
    over the mesh: entity tables/moments stay row-sharded across the
    scan. ``order`` semantics match
    :func:`regcn_tpu.train.epoch.make_epoch_fn`.

    ``agg`` selects the cross-shard RGCN aggregation:

    - ``"gspmd"``: XLA inserts the src-gather all-gather per layer and a
      psum for the sharded CE logsumexp from the sharding annotations;
    - ``"halo"``: the explicit shard_map boundary-halo exchange
      (:func:`regcn_tpu.parallel.halo.halo_rgcn_aggregate`) — comm is
      the per-snapshot boundary set, not the whole table. Requires the
      store to be built with ``halo_shards=mesh graph size``.
    """
    from regcn_tpu.train.epoch import window_snapshot

    if agg not in ("gspmd", "halo"):
        raise ValueError(f"agg must be 'gspmd' or 'halo', got {agg!r}")
    if agg == "halo":
        from regcn_tpu.dist import HaloImpl, check_impl_compatible

        check_impl_compatible(impl, agg)
        impl = HaloImpl(mesh)

    from regcn_tpu.utils.dtypes import tree_to_compute, tree_to_fp32

    opt = make_optimizer(tc)
    hlen = tc.train_history_len
    cdt = jnp.dtype(cfg.dtype)
    ent_rows = NamedSharding(mesh, P(GRAPH_AXIS, None))

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

    def epoch_fn(state: TrainState, store, order):
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
            new_params["dynamic_emb"] = jax.lax.with_sharding_constraint(
                new_params["dynamic_emb"], ent_rows)
            return TrainState(
                params=new_params, opt_state=new_opt_state,
                model_state=new_model_state, rng=rng, step=st.step + 1,
            ), losses

        return jax.lax.scan(body, state, order)

    with mesh:
        return jax.jit(epoch_fn, donate_argnums=(0,))
