"""Rematerialization policy for the evolution scans.

The per-snapshot evolution step is HBM-bandwidth-bound at reference
scale: without remat, the history `lax.scan` stores ~6 full-entity-table
residual tensors per step ([T, N, d] dynamic-update-slice fusions) and
the backward pass re-reads them all — measured at ~21% of the headline
epoch time (see tools/perf_bwd_breakdown.py and the HLO profile notes in
docs/ARCHITECTURE.md). Wrapping the scan body in
``jax.checkpoint(policy=nothing_saveable)`` keeps only the carry per
step and recomputes the step's internals during the backward; the
recompute (a few GEMMs + fused elementwise passes) is cheaper than the
residual traffic. Saving dot outputs (``dots_saveable``) was measured
slower than full recompute — the GEMM outputs are exactly the full-table
tensors we are trying not to spill.

Applied only to the hyperbolic evolution scans (ball and tangent paths,
+17% epoch throughput at the headline config): the Euclidean and hisres
steps have far fewer full-table intermediates and measured ~4% SLOWER
with remat, so their scans store residuals as usual.
"""

from __future__ import annotations

import jax

__all__ = ["remat_scan_step"]


def remat_scan_step(step):
    """Wrap a ``lax.scan`` body so its backward recomputes instead of
    spilling full-table residuals to HBM. A no-op for forward-only use
    (predict/eval)."""
    return jax.checkpoint(step, policy=jax.checkpoint_policies.nothing_saveable)
