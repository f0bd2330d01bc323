"""Tests for the hyperbolic GRU family (ref:hyperbolic_src/hyperbolic_gru.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.hyperbolic import gru as G
from regcn_tpu.hyperbolic import ops as H
from regcn_tpu.models.layers import gru_cell

C = 0.01


def _ball_points(rng, shape, scale=0.1):
    return H.exp_map_zero(jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale), C)


def test_cell_matches_tangent_gru(rng):
    """Cell == log -> Euclidean GRU -> exp, exactly (ref :47-68)."""
    params = G.init_hyperbolic_gru_cell(jax.random.PRNGKey(0), 8, 8)
    x = _ball_points(rng, (5, 8))
    h = _ball_points(rng, (5, 8))
    out = G.hyperbolic_gru_cell(params, x, h, C)
    expected = H.exp_map_zero(
        gru_cell(params, H.log_map_zero(x, C), H.log_map_zero(h, C)), C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)
    # output stays strictly inside the ball
    assert float(jnp.max(jnp.linalg.norm(out, axis=-1))) < 1.0 / np.sqrt(C)


def test_tangent_input_entry_point(rng):
    params = G.init_hyperbolic_gru_cell(jax.random.PRNGKey(1), 8, 8)
    x_tan = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    h = _ball_points(rng, (4, 8))
    out = G.hyperbolic_gru_cell_tangent_input(params, x_tan, h, C)
    expected = G.hyperbolic_gru_cell(params, H.exp_map_zero(x_tan, C), h, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_sequence_gru_matches_stepwise_cell(rng):
    """The scanned sequence == Python loop of cells (ref :136-190).

    The implementation keeps the carry in tangent space between steps;
    this must be numerically equivalent to the reference's
    exp-then-log round trip at the origin.
    """
    T, B, d = 6, 3, 8
    params = G.init_hyperbolic_gru(jax.random.PRNGKey(2), d, d, num_layers=2)
    x = _ball_points(rng, (T, B, d))
    outs, h_n = G.hyperbolic_gru(params, x, C)

    # manual: layer by layer, step by step, through ball-space cells
    layer_in = x
    finals = []
    for i in range(2):
        h = H.exp_map_zero(jnp.zeros((B, d)), C)
        step_outs = []
        for t in range(T):
            h = G.hyperbolic_gru_cell(params[f"layer{i}"], layer_in[t], h, C)
            step_outs.append(h)
        layer_in = jnp.stack(step_outs, axis=0)
        finals.append(h)

    np.testing.assert_allclose(np.asarray(outs), np.asarray(layer_in),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_n), np.asarray(jnp.stack(finals)),
                               rtol=2e-4, atol=1e-6)


def test_sequence_gru_initial_state(rng):
    T, B, d = 3, 2, 8
    params = G.init_hyperbolic_gru(jax.random.PRNGKey(3), d, d)
    x = _ball_points(rng, (T, B, d))
    h0 = _ball_points(rng, (1, B, d))
    outs, h_n = G.hyperbolic_gru(params, x, C, h0_hyp=h0)
    assert outs.shape == (T, B, d)
    assert h_n.shape == (1, B, d)
    # final state is the last output of the (single) top layer
    np.testing.assert_allclose(np.asarray(h_n[0]), np.asarray(outs[-1]), rtol=1e-6)


def test_entity_time_gate_matches_regcn_formula(rng):
    """Tangent-space RE-GCN time gate (ref :231-266)."""
    d = 8
    params = G.init_hyperbolic_entity_gru(jax.random.PRNGKey(4), d)
    cur = _ball_points(rng, (10, d))
    prev = _ball_points(rng, (10, d))
    out = G.hyperbolic_entity_gru(params, cur, prev, C)
    cur_t, prev_t = H.log_map_zero(cur, C), H.log_map_zero(prev, C)
    gate = jax.nn.sigmoid(prev_t @ params["time_gate_w"] + params["time_gate_b"])
    expected = H.exp_map_zero(gate * cur_t + (1 - gate) * prev_t, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_relation_gru_differentiable(rng):
    d = 8
    params = G.init_hyperbolic_relation_gru(jax.random.PRNGKey(5), d)
    rel_in = jnp.asarray(rng.normal(size=(6, 2 * d)).astype(np.float32))
    prev = _ball_points(rng, (6, d))

    def loss(p):
        return jnp.sum(G.hyperbolic_relation_gru(p, rel_in, prev, C) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)
