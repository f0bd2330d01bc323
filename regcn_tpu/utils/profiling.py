"""Profiling and analysis hooks.

The reference has no profiler integration at all (SURVEY.md §5 — only
wall-clock epoch prints); this module provides:

- :func:`trace`: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution;
- :func:`gradient_stats`: per-parameter gradient norms (parity with
  ref:hyperbolic_src/hyperbolic_model.py:1090-1108 ``log_gradient_stats``),
  computed in one jitted pass over the grad pytree;
- :class:`StepTimer`: cheap rolling wall-clock stats for train loops;
- :func:`training_summary`: parameter counts / config echo (parity with
  ref :1110-1128 ``get_training_summary``).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/regcn_tpu_trace", enabled: bool = True):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


@jax.jit
def _grad_norms(grads):
    return jax.tree.map(lambda g: jnp.linalg.norm(g.astype(jnp.float32)), grads)


def gradient_stats(grads: Any, top_k: int = 10) -> Dict[str, float]:
    """Per-parameter gradient norms + global norm, sorted descending."""
    norms = jax.tree_util.tree_map_with_path(
        lambda path, g: (jax.tree_util.keystr(path), g), _grad_norms(grads)
    )
    flat = [leaf for leaf in jax.tree.leaves(norms, is_leaf=lambda x: isinstance(x, tuple))]
    named = {name: float(v) for name, v in flat}
    global_norm = float(np.sqrt(sum(v**2 for v in named.values())))
    top = dict(sorted(named.items(), key=lambda kv: -kv[1])[:top_k])
    return {"global_norm": global_norm, **top}


def embedding_stats(emb: Any, prefix: str = "emb") -> Dict[str, float]:
    """Row-norm statistics of an embedding table (parity with the
    reference's per-run embedding logging under --run-analysis,
    ref:hyperbolic_src/hyperbolic_ops.py log_embedding_stats)."""
    norms = np.linalg.norm(
        np.asarray(jax.device_get(emb), np.float32), axis=-1)
    return {
        f"{prefix}_norm_mean": float(norms.mean()),
        f"{prefix}_norm_std": float(norms.std()),
        f"{prefix}_norm_max": float(norms.max()),
    }


def parameter_count(params: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def training_summary(params: Any, cfg: Any) -> Dict[str, Any]:
    return {
        "num_parameters": parameter_count(params),
        "num_tensors": len(jax.tree.leaves(params)),
        "config": {k: v for k, v in vars(cfg).items()} if hasattr(cfg, "__dict__")
        else {f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()}
        if hasattr(cfg, "__dataclass_fields__") else str(cfg),
    }


class StepTimer:
    """Rolling wall-clock statistics for training steps."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def mean_s(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def p50_s(self) -> float:
        return float(np.median(self.times)) if self.times else 0.0
