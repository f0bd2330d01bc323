"""Hyperbolic GRU family: tangent-space recurrences on the Poincaré ball.

Parity with ref:hyperbolic_src/hyperbolic_gru.py — the library/auxiliary
recurrent modules of the hyperbolic package (the main model wires a plain
Euclidean GRU + inline time-gate math, ref:hyperbolic_model.py:408,:841-860;
these modules are the standalone reusable equivalents).

All cells follow the same contract: log-map ball points to the tangent
space at the origin, run the Euclidean recurrence there, exp-map back.
TPU-native differences from the reference:

- the sequence loop of ``hyperbolic_gru`` is a ``lax.scan`` (compiled
  once, static shapes), not a Python time loop (ref :170-172);
- cells are pure functions over a params pytree, so they can be carried
  through ``scan``/``jit``/``grad`` without module state;
- interior log/exp round-trips between scan steps are elided: the carry
  stays in tangent space across time steps (mathematically identical,
  since the reference immediately log-maps the previous step's exp-mapped
  output — an exact inverse at the origin), halving transcendental work.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regcn_tpu.hyperbolic import ops as H
from regcn_tpu.models.layers import gru_cell, init_gru_cell

Params = Dict[str, jax.Array]


# ------------------------------------------------------------- single cell

def init_hyperbolic_gru_cell(rng: jax.Array, input_size: int,
                             hidden_size: int) -> Params:
    """Tangent-space GRU cell (ref :20-94)."""
    return init_gru_cell(rng, input_size, hidden_size)


def hyperbolic_gru_cell(params: Params, x_hyp: jax.Array, h_hyp: jax.Array,
                        c) -> jax.Array:
    """One step: log both, GRU in tangent space, exp back (ref :47-68)."""
    x_tan = H.log_map_zero(x_hyp, c)
    h_tan = H.log_map_zero(h_hyp, c)
    return H.exp_map_zero(gru_cell(params, x_tan, h_tan), c)


def hyperbolic_gru_cell_tangent_input(params: Params, x_tan: jax.Array,
                                      h_hyp: jax.Array, c) -> jax.Array:
    """Step with the input already in tangent space (ref :70-94)."""
    h_tan = H.log_map_zero(h_hyp, c)
    return H.exp_map_zero(gru_cell(params, x_tan, h_tan), c)


# ---------------------------------------------------------- sequence model

def init_hyperbolic_gru(rng: jax.Array, input_size: int, hidden_size: int,
                        num_layers: int = 1) -> Params:
    """Stacked sequence GRU (ref :97-190; unidirectional)."""
    ks = jax.random.split(rng, num_layers)
    return {
        f"layer{i}": init_gru_cell(
            ks[i], input_size if i == 0 else hidden_size, hidden_size)
        for i in range(num_layers)
    }


def hyperbolic_gru(
    params: Params,
    x_hyp: jax.Array,  # [T, B, in] ball points (seq-major)
    c,
    h0_hyp: Optional[jax.Array] = None,  # [L, B, hidden] ball points
    *,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the stacked tangent GRU over a sequence (ref :136-190).

    Returns (outputs [T, B, hidden], h_n [L, B, hidden]), both on the ball.
    The per-layer time loop is one ``lax.scan``; the carry stays in
    tangent space (see module docstring).
    """
    num_layers = len(params)
    T, B, _ = x_hyp.shape
    hidden = params["layer0"]["w_hh"].shape[1]
    if h0_hyp is None:
        h0_tan = jnp.zeros((num_layers, B, hidden), x_hyp.dtype)
    else:
        h0_tan = H.log_map_zero(h0_hyp, c)

    layer_in_tan = H.log_map_zero(x_hyp, c)  # [T, B, in]
    finals = []
    for i in range(num_layers):
        cell_params = params[f"layer{i}"]

        def step(h_tan, x_tan, cell_params=cell_params):
            h_new = gru_cell(cell_params, x_tan, h_tan)
            return h_new, h_new

        h_last, outs = jax.lax.scan(step, h0_tan[i], layer_in_tan)
        finals.append(h_last)
        layer_in_tan = outs
        if train and dropout > 0.0 and rng is not None and i < num_layers - 1:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, layer_in_tan.shape)
            layer_in_tan = jnp.where(keep, layer_in_tan / (1.0 - dropout), 0.0)

    outputs = H.exp_map_zero(layer_in_tan, c)
    h_n = H.exp_map_zero(jnp.stack(finals, axis=0), c)
    return outputs, h_n


# -------------------------------------------------- entity time gate (ball)

def init_hyperbolic_entity_gru(rng: jax.Array, hidden_size: int) -> Params:
    """RE-GCN time gate in tangent space (ref :193-266)."""
    import math

    from regcn_tpu.utils.init import xavier_uniform
    return {
        "time_gate_w": xavier_uniform(rng, (hidden_size, hidden_size),
                                      gain=math.sqrt(2.0)),
        "time_gate_b": jnp.zeros((hidden_size,)),
    }


def hyperbolic_entity_gru(params: Params, current_hyp: jax.Array,
                          prev_hyp: jax.Array, c) -> jax.Array:
    """gate = sigmoid(prev_tan @ W + b); blend in tangent space (ref :231-266)."""
    cur_tan = H.log_map_zero(current_hyp, c)
    prev_tan = H.log_map_zero(prev_hyp, c)
    gate = jax.nn.sigmoid(prev_tan @ params["time_gate_w"] + params["time_gate_b"])
    return H.exp_map_zero(gate * cur_tan + (1.0 - gate) * prev_tan, c)


# ------------------------------------------------------ relation evolution

def init_hyperbolic_relation_gru(rng: jax.Array, hidden_size: int) -> Params:
    """Relation GRU, input = [rel ‖ entity context] (ref :269-312)."""
    return init_gru_cell(rng, 2 * hidden_size, hidden_size)


def hyperbolic_relation_gru(params: Params, rel_input_tan: jax.Array,
                            prev_rel_hyp: jax.Array, c) -> jax.Array:
    """Input already tangent; hidden state on the ball (ref :290-312)."""
    prev_tan = H.log_map_zero(prev_rel_hyp, c)
    return H.exp_map_zero(gru_cell(params, rel_input_tan, prev_tan), c)
