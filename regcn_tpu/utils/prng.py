"""PRNG configuration.

JAX's default threefry2x32 PRNG is computed on the VPU and costs ~40% of
a full RE-GCN training epoch at ICEWS scale (6 dropout masks per step,
measured: 1.57 -> 0.98 s/epoch after switching). ``use_fast_prng``
selects the TPU-native ``rbg`` generator — still splittable and
deterministic per key, slightly different stream semantics (documented
JAX caveat: shape-dependent upgrade behavior under vmap). Called by the
CLI and bench entry points; tests keep the default for strict
reproducibility against recorded values.
"""

from __future__ import annotations

import jax


def use_fast_prng() -> None:
    jax.config.update("jax_default_prng_impl", "rbg")
