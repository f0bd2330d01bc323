"""Activation functions matching the reference's torch semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch F.rrelu defaults (ref uses F.rrelu at ref:src/rrgcn.py:16)
RRELU_LOWER = 1.0 / 8.0
RRELU_UPPER = 1.0 / 3.0


def rrelu(x: jax.Array, rng: jax.Array | None = None, train: bool = False) -> jax.Array:
    """Randomized leaky ReLU.

    Training: negative slope ~ U[1/8, 1/3] per element (torch semantics).
    Eval (or rng=None): fixed slope (lower+upper)/2.
    """
    if train and rng is not None:
        slope = jax.random.uniform(
            rng, x.shape, dtype=x.dtype, minval=RRELU_LOWER, maxval=RRELU_UPPER
        )
    else:
        slope = (RRELU_LOWER + RRELU_UPPER) / 2.0
    return jnp.where(x >= 0, x, x * slope)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Row L2 normalisation, parity with torch F.normalize (p=2).

    Note: the reference's ``--layer-norm`` flag gates F.normalize, not
    LayerNorm (ref:src/rrgcn.py:151-176).
    """
    # clamp inside the sqrt so zero rows have finite (zero) gradients;
    # fp32 island so bf16 compute mode keeps full-precision norms
    x32 = x.astype(jnp.float32)
    sq = jnp.sum(x32 * x32, axis=axis, keepdims=True)
    return (x32 / jnp.sqrt(jnp.maximum(sq, eps * eps))).astype(x.dtype)
