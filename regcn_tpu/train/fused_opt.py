"""Fused-small-leaf optimizer wrapper — a kernel-count optimization.

The headline training step is op-count-bound (~1.8k kernels/step at
~1.4 µs each, docs/BENCHMARKS.md); the param pytree's many SMALL leaves
(GRU gate biases, layer-norm scales, decoder biases, scalar margins)
each dispatch their own optimizer kernels per step. ``optax.flatten``
was measured and rejected (round 2): flattening the 6.25M-param entity
tables costs more in concat traffic than the per-leaf dispatches save.

:func:`fuse_small_leaves` flattens ONLY the small leaves (< threshold
elements) into one fused vector before the wrapped transformation and
splits the updates back after — the big tables keep their own (already
efficient) per-leaf kernels. Mathematically exact for any elementwise
transformation and for global reductions (``clip_by_global_norm``,
Adam, weight decay): concatenation changes neither elementwise updates
nor the global norm.

Caveat: the wrapped transformation's STATE lives on the fused
structure, so checkpoints are not interchangeable between fused and
unfused optimizers (the resume template is built from the same config,
so self-consistent runs are unaffected).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import optax

DEFAULT_THRESHOLD = 16_384  # elements; 64 KiB fp32


def _is_small(leaf: Any, threshold: int) -> bool:
    return (
        hasattr(leaf, "size")
        and hasattr(leaf, "dtype")
        and jnp.issubdtype(leaf.dtype, jnp.floating)
        and leaf.size < threshold
        and leaf.size > 0
    )


def _split(tree: Any, threshold: int) -> Tuple[Any, List[bool], List, List]:
    leaves, treedef = jax.tree.flatten(tree)
    flags = [_is_small(l, threshold) for l in leaves]
    small = [l for l, s in zip(leaves, flags) if s]
    big = [l for l, s in zip(leaves, flags) if not s]
    return treedef, flags, small, big


def _fuse(small: List) -> jax.Array:
    if not small:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(
        [l.reshape(-1).astype(jnp.float32) for l in small])


def _unfuse(vec: jax.Array, templates: List) -> List:
    out, off = [], 0
    for t in templates:
        out.append(vec[off:off + t.size].reshape(t.shape).astype(t.dtype))
        off += t.size
    return out


def fuse_small_leaves(
    inner: optax.GradientTransformation,
    threshold: int = DEFAULT_THRESHOLD,
) -> optax.GradientTransformation:
    """Run ``inner`` with all small float leaves concatenated into one
    fused vector (structure: ``{"fused": [K], "big": [leaf, ...]}``)."""

    def _restructure(tree):
        treedef, flags, small, big = _split(tree, threshold)
        return {"fused": _fuse(small), "big": big}, (treedef, flags, small)

    def init_fn(params):
        fused, _ = _restructure(params)
        return inner.init(fused)

    def update_fn(updates, state, params=None):
        fused_g, (treedef, flags, small_g) = _restructure(updates)
        fused_p = None
        if params is not None:
            fused_p, _ = _restructure(params)
        out, new_state = inner.update(fused_g, state, fused_p)
        small_u = _unfuse(out["fused"], small_g)
        it_s, it_b = iter(small_u), iter(out["big"])
        leaves = [next(it_s) if s else next(it_b) for s in flags]
        return jax.tree.unflatten(treedef, leaves), new_state

    return optax.GradientTransformation(init_fn, update_fn)
