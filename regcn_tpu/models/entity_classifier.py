"""Basis-RGCN entity classifier (legacy RGCN task, TPU-native).

The model behind the reference's legacy entity-classification stack
(ref:rgcn/knowledge_graph.py:25-135 loads aifb/mutag/bgs/am;
ref:rgcn/layers.py:96-144 is the basis layer; the original RGCN paper's
node-classification task): a featureless basis-decomposition input layer
followed by basis hidden layers, softmax over classes at labeled nodes.

TPU-first design: the whole dataset is one static padded graph
(``data/rdf.py:StaticGraph``), every layer is gather → B dense MXU GEMMs
→ masked segment-sum, and the full training run is ONE compiled
``lax.scan`` over epochs (full-batch gradient descent — the legacy task
is full-batch in the reference lineage too).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from regcn_tpu.data.rdf import EntityClassData, StaticGraph, to_static_graph
from regcn_tpu.models.layers import init_rgcn_basis_layer, rgcn_basis_layer

Params = Dict[str, Dict[str, jax.Array]]


@dataclasses.dataclass(frozen=True)
class EntityClassifierConfig:
    h_dim: int = 16
    n_bases: int = -1  # <=0: one basis per relation
    n_hidden_layers: int = 1  # basis layers between input and output
    dropout: float = 0.0
    lr: float = 1e-2
    l2: float = 5e-4  # weight decay on the input layer (RGCN convention)
    n_epochs: int = 60
    edge_bucket: int = 128


def init_entity_classifier(rng: jax.Array, data: EntityClassData,
                           cfg: EntityClassifierConfig) -> Params:
    ks = jax.random.split(rng, cfg.n_hidden_layers + 2)
    params: Params = {
        "input": init_rgcn_basis_layer(
            ks[0], data.num_nodes, cfg.h_dim, data.num_rels,
            num_bases=cfg.n_bases, bias=True),
    }
    for i in range(cfg.n_hidden_layers - 1):
        params[f"hidden{i}"] = init_rgcn_basis_layer(
            ks[i + 1], cfg.h_dim, cfg.h_dim, data.num_rels,
            num_bases=cfg.n_bases, bias=True)
    params["output"] = init_rgcn_basis_layer(
        ks[-1], cfg.h_dim, data.num_classes, data.num_rels,
        num_bases=cfg.n_bases, bias=True)
    return params


def entity_logits(params: Params, graph: StaticGraph,
                  cfg: EntityClassifierConfig, *,
                  rng: jax.Array | None = None, train: bool = False) -> jax.Array:
    """[N, num_classes] class logits for every node."""
    h = rgcn_basis_layer(params["input"], jnp.zeros((graph.in_deg_norm.shape[0], 1)),
                         graph, input_layer=True, activation=jax.nn.relu)
    i = 0
    while f"hidden{i}" in params:
        if train and cfg.dropout > 0.0 and rng is not None:
            keep = jax.random.bernoulli(jax.random.fold_in(rng, i),
                                        1.0 - cfg.dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - cfg.dropout), 0.0)
        h = rgcn_basis_layer(params[f"hidden{i}"], h, graph,
                             activation=jax.nn.relu)
        i += 1
    if train and cfg.dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(jax.random.fold_in(rng, 101),
                                    1.0 - cfg.dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - cfg.dropout), 0.0)
    return rgcn_basis_layer(params["output"], h, graph)


def _loss_fn(params: Params, graph: StaticGraph, labels: jax.Array,
             idx: jax.Array, cfg: EntityClassifierConfig,
             rng: jax.Array) -> jax.Array:
    logits = entity_logits(params, graph, cfg, rng=rng, train=True)[idx]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels[idx]).mean()
    l2 = sum(jnp.sum(jnp.square(w)) for w in jax.tree.leaves(params["input"]))
    return ce + cfg.l2 * l2


def fit(rng: jax.Array, data: EntityClassData,
        cfg: EntityClassifierConfig) -> Tuple[Params, jax.Array]:
    """Full training run as one compiled scan over epochs.

    Returns (params, per-epoch train loss [n_epochs]).
    """
    graph = _graph_for(data, cfg.edge_bucket)
    labels = jnp.asarray(data.labels)
    train_idx = jnp.asarray(data.train_idx)
    params = init_entity_classifier(rng, data, cfg)
    tx = optax.adam(cfg.lr)

    @partial(jax.jit, static_argnames=())
    def run(params, opt_state, key):
        def step(carry, i):
            params, opt_state = carry
            k = jax.random.fold_in(key, i)
            loss, grads = jax.value_and_grad(_loss_fn)(
                params, graph, labels, train_idx, cfg, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(cfg.n_epochs))
        return params, losses

    params, losses = run(params, tx.init(params), rng)
    return params, losses


# evaluate() is called repeatedly (train acc, test acc, sweeps): memoise
# the padded graph on the dataset object and route the forward through
# one module-level jit so XLA's compile cache is reused across calls
@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_logits(params, graph, cfg):
    return entity_logits(params, graph, cfg)


def _graph_for(data: EntityClassData, edge_bucket: int) -> StaticGraph:
    cached = getattr(data, "_graph_cache", None)
    if cached is None or cached[0] != edge_bucket:
        cached = (edge_bucket, to_static_graph(data, edge_bucket))
        data._graph_cache = cached  # plain dataclass: attach memo
    return cached[1]


def evaluate(params: Params, data: EntityClassData,
             cfg: EntityClassifierConfig, idx=None) -> float:
    """Classification accuracy on ``idx`` (default: test split)."""
    graph = _graph_for(data, cfg.edge_bucket)
    idx = jnp.asarray(data.test_idx if idx is None else idx)
    logits = _jit_logits(params, graph, cfg)
    pred = jnp.argmax(logits[idx], axis=-1)
    return float(jnp.mean(pred == jnp.asarray(data.labels)[idx]))
