"""Microbenchmark: streaming (Pallas flash-softmax) CE vs dense XLA CE.

Times the full training consumer — value + grad of the masked-mean CE
over all candidates — at realistic (B, N) shapes. Run on the real chip:

    PYTHONPATH="/root/repo:$PYTHONPATH" python tools/bench_scoring.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.hyperbolic import decoders as D
from regcn_tpu.hyperbolic import ops as H

C = 0.01
SHAPES = [  # (name, B queries, N candidates)
    ("icews14s", 1024, 7_128),
    ("icews05-15", 1024, 10_488),
    ("wiki", 1024, 12_554),
    ("icews18", 1024, 23_033),
    ("big-N", 1024, 65_536),
]


def bench_one(name, b, n, d=200, iters=30, true_dist=False):
    rng = np.random.default_rng(0)
    q = H.exp_map_zero(jnp.asarray(rng.normal(size=(b, d)).astype("float32") * 0.4), C)
    x = H.exp_map_zero(jnp.asarray(rng.normal(size=(n, d)).astype("float32") * 0.4), C)
    tgt = jnp.asarray(rng.integers(0, n, b))
    bias = jnp.asarray(rng.normal(size=n).astype("float32") * 0.1)
    mask = jnp.asarray((rng.uniform(size=b) > 0.1).astype("float32"))
    # per-query (relation-specific) curvature exercises the round-3
    # true-distance kernel path (ref:hyperbolic_decoder.py:704-727)
    qc = (jnp.asarray(rng.uniform(0.005, 0.05, b).astype("float32"))
          if true_dist else None)

    def loss(streaming, q, x, bias, scale, margin):
        return D.dist_ce_loss(q, x, tgt, jnp.float32(C), mask=mask,
                              candidate_bias=bias, score_scale=scale,
                              score_margin=margin, streaming=streaming,
                              query_curvature=qc,
                              use_hyperbolic_distance=true_dist)

    vals, times = {}, {}
    for mode in (False, True):
        grad_fn = jax.jit(jax.value_and_grad(
            lambda q, x, bias, scale, margin, mode=mode: loss(
                mode, q, x, bias, scale, margin), argnums=(0, 1, 2, 3, 4)))
        args = (q, x, bias, jnp.float32(1.3), jnp.float32(0.7))
        v, g = grad_fn(*args)
        jax.block_until_ready(g)
        vals[mode] = float(v)
        t0 = time.perf_counter()
        for _ in range(iters):
            v, g = grad_fn(*args)
        jax.block_until_ready(g)
        times[mode] = (time.perf_counter() - t0) / iters * 1e3
    rel = abs(vals[True] - vals[False]) / (abs(vals[False]) + 1e-9)
    tag = "true-dist+qc" if true_dist else "proxy"
    print(f"{name:12s} {tag:12s} B={b} N={n:6d} | fwd+bwd dense "
          f"{times[False]:7.3f} ms streaming {times[True]:7.3f} ms "
          f"({times[False]/times[True]:4.2f}x) | loss rel err {rel:.2e}")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    for shape in SHAPES:
        bench_one(*shape)
    for shape in SHAPES:
        bench_one(*shape, true_dist=True)
