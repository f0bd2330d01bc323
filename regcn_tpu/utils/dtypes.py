"""Mixed-precision helpers shared by the trainers.

The bf16 compute mode casts fp32 array leaves of the parameter/input
pytrees to the compute dtype at the loss boundary; parameters, optimizer
state, norm/transcendental islands, BatchNorm statistics and CE
reductions stay fp32 (see docs/ARCHITECTURE.md "Numerics"). Scalars
(0-d leaves: learnable curvature, score margins, gate thresholds) are
left fp32 so their avals stay stable across steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_to_compute(tree, compute_dtype):
    """Cast fp32 array leaves (ndim >= 1) of ``tree`` to ``compute_dtype``."""
    cdt = jnp.dtype(compute_dtype)
    if cdt == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(cdt)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 1
        else x,
        tree,
    )


def tree_to_fp32(tree):
    """Upcast floating leaves to fp32 (grads/losses leaving a bf16 loss)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
