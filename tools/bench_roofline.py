"""North-star roofline: RGCN-layer edges/s/chip vs the analytic bound.

Round-4 verdict weak item #4: the headline ``edge_messages_per_s`` was a
latency-bound small shape and "speed-of-light SpMM" (BASELINE.json
north_star) was asserted nowhere as a fraction of the hardware bound.
This benches the fused RGCN aggregation (``ops/rgcn_scatter``, the
framework's hot kernel) at LARGE shapes — N up to ~1M entities, E up to
~4M edges, d 64-200, fp32 and bf16, forward and fwd+bwd, XLA vs Pallas —
and reports achieved edges/s plus %-of-roofline against

    t_bound = max(FLOPs / peak_flops, HBM bytes / peak_bw)

with the MINIMAL traffic model (each gathered source row read once, each
message accumulated once, output written once):

    fwd:      FLOPs = 2 E d^2          bytes = (2 E d + 2 N d) * b
    fwd+bwd:  FLOPs = 6 E d^2          bytes = 3 * fwd bytes

(backward re-reads the edge stream for dL/dh scatter and dL/dW GEMM; the
sorted-scatter lowering XLA actually emits moves MORE than this, so the
bound is conservative — achieved% is a lower bound on kernel quality.)

1x TPU v5e peaks used: 197 TFLOP/s bf16, 49 TFLOP/s fp32, 819 GB/s HBM.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_roofline.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.ops.rgcn_scatter import rgcn_aggregate

PEAK_FLOPS = {"bfloat16": 197e12, "float32": 49e12}
HBM_BW = 819e9  # bytes/s, v5e

# (N, E, d) — small->large; E in the millions is the scatter-bound
# regime the Pallas kernel was designed for and round 4 never measured
SHAPES = [
    (65_536, 262_144, 128),
    (262_144, 1_048_576, 128),
    (1_048_576, 4_194_304, 64),
    (1_048_576, 4_194_304, 128),
    (262_144, 1_048_576, 200),
]


def bound_s(e, n, d, dtype, mode):
    b = 2 if dtype == "bfloat16" else 4
    flops = 2.0 * e * d * d * (3.0 if mode == "fwdbwd" else 1.0)
    byts = (2.0 * e * d + 2.0 * n * d) * b * (3.0 if mode == "fwdbwd" else 1.0)
    return max(flops / PEAK_FLOPS[dtype], byts / HBM_BW), flops, byts


def timed(fn, arg, iters):
    out = jax.block_until_ready(fn(arg))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(arg))
    first = time.perf_counter() - t0
    # adaptive: slow cells (the pathological scatters) get fewer reps;
    # fast cells NEED many queued iters — a single dispatch through the
    # axon tunnel carries ~25 ms of fixed latency that back-to-back
    # queued calls amortize
    if first > 1.0:
        iters, repeats = 1, 3
    elif first > 0.1:
        iters, repeats = 3, 3
    else:
        repeats = 5
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2]


def bench_one(n, e, d, dtype, iters=10):
    rng = np.random.default_rng(0)
    jdt = jnp.dtype(dtype)
    h = jnp.asarray(rng.normal(size=(n, d)), jdt)
    rel_emb = jnp.asarray(rng.normal(size=(460, d)), jdt)
    w = jnp.asarray(rng.normal(size=(d, d)) * 0.05, jdt)
    src = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    dst = jnp.asarray(np.sort(rng.integers(0, n, e)), jnp.int32)  # dst-sorted
    rel = jnp.asarray(rng.integers(0, 460, e), jnp.int32)
    mask = jnp.ones((e,), jnp.float32)
    norm = jnp.asarray(rng.uniform(0.1, 1.0, size=n), jnp.float32)

    rows = []
    for impl in ("xla", "pallas", "cumsum"):
        fwd = jax.jit(lambda hh, i=impl: rgcn_aggregate(
            hh, rel_emb, w, src, dst, rel, mask, norm, impl=i,
            dst_sorted=True))
        bwd = jax.jit(jax.grad(lambda hh, i=impl: jnp.sum(rgcn_aggregate(
            hh, rel_emb, w, src, dst, rel, mask, norm, impl=i,
            dst_sorted=True) ** 2)))
        for mode, fn in (("fwd", fwd), ("fwdbwd", bwd)):
            try:
                t = timed(fn, h, iters)
            except Exception as exc:  # OOM at the largest shapes
                rows.append(dict(impl=impl, mode=mode, error=str(exc)[:80]))
                continue
            tb, flops, byts = bound_s(e, n, d, dtype, mode)
            rows.append(dict(
                impl=impl, mode=mode, ms=round(t * 1e3, 3),
                edges_per_s=round(e / t / 1e6, 1),
                bound_ms=round(tb * 1e3, 3),
                pct_of_roofline=round(100.0 * tb / t, 1),
                bound_limit=("mxu" if flops / PEAK_FLOPS[dtype]
                             > byts / HBM_BW else "hbm"),
            ))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="float32,bfloat16")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    for dtype in args.dtypes.split(","):
        for n, e, d in SHAPES:
            for row in bench_one(n, e, d, dtype):
                print(json.dumps({"N": n, "E": e, "d": d,
                                  "dtype": dtype, **row}), flush=True)


if __name__ == "__main__":
    main()
