"""Parameter initialisers with torch-parity semantics.

The reference initialises with torch's xavier_uniform/xavier_normal
(relu gain), plain normal, and torch's default kaiming-uniform for
Linear/Conv layers; matching them keeps golden activation tests and MRR
trajectories comparable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

RELU_GAIN = math.sqrt(2.0)


def xavier_uniform(rng, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    if len(shape) > 2:  # conv: [out_c, in_c, k] -> fans include receptive field
        rf = math.prod(shape[2:])
        fan_in, fan_out = shape[1] * rf, shape[0] * rf
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, minval=-a, maxval=a)


def xavier_normal(rng, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(rng, shape, dtype) * std


def torch_linear_uniform(rng, shape, fan_in: int, dtype=jnp.float32):
    """torch nn.Linear/Conv default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def gru_uniform(rng, shape, hidden_size: int, dtype=jnp.float32):
    """torch nn.GRUCell default: U(-1/sqrt(H), 1/sqrt(H)) for all params."""
    bound = 1.0 / math.sqrt(hidden_size)
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)
