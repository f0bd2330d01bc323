"""Microbenchmark: Pallas scatter kernel vs XLA segment_sum on real TPU.

Runs the full RGCN aggregation (gather -> edge GEMM -> scatter * norm)
with impl in {xla, pallas} at the dataset shapes that matter
(ICEWS14s / ICEWS18 / WIKI / GDELT-ish), checks allclose, and prints a
table of per-call times. Run on the real chip:

    PYTHONPATH=. python tools/bench_pallas.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.ops.rgcn_scatter import rgcn_aggregate

# (name, N entities, d, E directed edges incl inverse)
SHAPES = [
    ("icews14s", 7_128, 200, 2_048),
    ("icews18", 23_033, 200, 16_384),
    ("wiki", 12_554, 200, 8_192),
    ("gdelt", 7_691, 200, 32_768),
    ("icews05-15", 10_488, 200, 8_192),
]


def bench_one(name, n, d, e, dtype=jnp.float32, iters=50):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(n, d)), dtype)
    rel_emb = jnp.asarray(rng.normal(size=(460, d)), dtype)
    w = jnp.asarray(rng.normal(size=(d, d)) * 0.05, dtype)
    src = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    dst = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    rel = jnp.asarray(rng.integers(0, 460, e), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=e) > 0.1, jnp.float32)
    norm = jnp.asarray(rng.uniform(0.1, 1.0, size=n), jnp.float32)

    outs, times = {}, {}
    for impl in ("xla", "pallas"):
        fn = jax.jit(
            lambda h, impl=impl: rgcn_aggregate(
                h, rel_emb, w, src, dst, rel, mask, norm, impl=impl))
        out = jax.block_until_ready(fn(h))
        outs[impl] = np.asarray(out, np.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(h)
        jax.block_until_ready(out)
        times[impl] = (time.perf_counter() - t0) / iters * 1e3

    # also time fwd+bwd (training is the real consumer)
    for impl in ("xla", "pallas"):
        fn = jax.jit(jax.grad(
            lambda h, impl=impl: jnp.sum(rgcn_aggregate(
                h, rel_emb, w, src, dst, rel, mask, norm, impl=impl) ** 2)))
        g = jax.block_until_ready(fn(h))
        t0 = time.perf_counter()
        for _ in range(iters):
            g = fn(h)
        jax.block_until_ready(g)
        times[impl + "_grad"] = (time.perf_counter() - t0) / iters * 1e3

    err = np.max(np.abs(outs["xla"] - outs["pallas"]))
    scale = np.max(np.abs(outs["xla"])) + 1e-9
    print(f"{name:12s} N={n:6d} E={e:6d} | fwd xla {times['xla']:7.3f} ms "
          f"pallas {times['pallas']:7.3f} ms ({times['xla']/times['pallas']:4.2f}x) | "
          f"fwd+bwd xla {times['xla_grad']:7.3f} ms "
          f"pallas {times['pallas_grad']:7.3f} ms "
          f"({times['xla_grad']/times['pallas_grad']:4.2f}x) | "
          f"rel_err {err/scale:.2e}")
    assert err / scale < 1e-5, f"{name}: pallas != xla ({err/scale:.2e})"


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    for shape in SHAPES:
        bench_one(*shape)
