"""Scaling benchmark: edge-partitioned RGCN aggregation across a mesh.

Measures edges/s for the shard_map halo-exchange aggregation at shard
counts 1/2/4/8 and reports scaling efficiency vs 1 shard. With one real
TPU chip only (this environment), run on the virtual CPU mesh for the
communication-pattern sanity numbers:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py

On a real pod slice the same harness runs unchanged over ICI.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _ensure_mesh():
    """Fall back to an 8-device virtual CPU mesh on single-chip hosts.

    XLA parses ``XLA_FLAGS`` once at first backend initialisation and
    sitecustomize pre-imports jax on this platform, so the fallback must
    re-exec: the child sets the flag before any backend exists and
    forces the cpu platform before touching devices."""
    import os

    if os.environ.get("_REGCN_SCALING_CHILD") == "1":
        jax.config.update("jax_platforms", "cpu")
        return
    if len(jax.devices()) >= 2:
        return
    env = dict(os.environ)
    env["_REGCN_SCALING_CHILD"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)] + sys.argv[1:], env)


def main(num_ents=16384, num_rels=200, num_edges=131072, d=200, steps=20):
    _ensure_mesh()
    from regcn_tpu.parallel.halo import partition_edges_by_dst, sharded_rgcn_aggregate
    from regcn_tpu.parallel.mesh import MeshAxes, make_mesh

    rng = np.random.default_rng(0)
    triples = np.stack([
        rng.integers(0, num_ents, num_edges // 2),
        rng.integers(0, num_rels, num_edges // 2),
        rng.integers(0, num_ents, num_edges // 2),
    ], axis=1)

    rel_emb = jnp.asarray(rng.normal(size=(2 * num_rels, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05)

    results = {}
    n_dev = len(jax.devices())
    for g in (1, 2, 4, 8):
        if g > n_dev:
            break
        mesh = make_mesh(MeshAxes(data=1, graph=g), devices=jax.devices()[:g])
        edges = partition_edges_by_dst(triples, num_ents, num_rels, g)
        n_pad = g * edges.rows_per_shard
        h = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))

        f = jax.jit(lambda h_: sharded_rgcn_aggregate(mesh, h_, rel_emb, w, edges))
        out = f(h)
        float(out.sum())  # sync
        t0 = time.perf_counter()
        for _ in range(steps):
            out = f(h)
        float(out.sum())
        dt = (time.perf_counter() - t0) / steps
        edges_per_s = num_edges / dt
        results[g] = edges_per_s

    base = results.get(1)
    report = {
        "metric": "halo_rgcn_edges_per_s",
        "platform": str(jax.devices()[0].platform),
        "per_shards": {
            str(g): {
                "edges_per_s": round(v, 1),
                "scaling_efficiency": round(v / (base * g), 3) if base else None,
            }
            for g, v in results.items()
        },
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
