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


SHAPES = [
    # (name, N, R, directed edges) — snapshot-sparse shapes are what the
    # framework actually aggregates per step; the dense case stresses comm
    ("icews14s-snap", 7_128, 230, 2_048),
    ("icews18-snap", 23_033, 256, 16_384),
    ("dense-16k", 16_384, 200, 131_072),
]


def main(d=200, steps=20):
    _ensure_mesh()
    out = {}
    for name, n, r, e in SHAPES:
        print(f"== {name}", flush=True)
        out[name] = bench_shape(num_ents=n, num_rels=r, num_edges=e, d=d,
                                steps=steps)
    return out


def bench_shape(num_ents, num_rels, num_edges, d=200, steps=20):
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

    from regcn_tpu.parallel.halo import (
        halo_rgcn_aggregate,
        partition_edges_boundary,
    )

    results = {"allgather": {}, "boundary": {}}
    halo_stats = {}
    n_dev = len(jax.devices())
    for g in (1, 2, 4, 8):
        if g > n_dev:
            break
        mesh = make_mesh(MeshAxes(data=1, graph=g), devices=jax.devices()[:g])

        def timed(fn, h):
            out = fn(h)
            float(out.sum())  # sync
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(h)
            float(out.sum())
            return num_edges / ((time.perf_counter() - t0) / steps)

        edges = partition_edges_by_dst(triples, num_ents, num_rels, g)
        h = jnp.asarray(rng.normal(
            size=(g * edges.rows_per_shard, d)).astype(np.float32))
        results["allgather"][g] = timed(
            jax.jit(lambda h_, e=edges, m=mesh: sharded_rgcn_aggregate(
                m, h_, rel_emb, w, e)), h)

        bedges, stats = partition_edges_boundary(triples, num_ents, num_rels, g)
        hb = jnp.asarray(rng.normal(
            size=(g * bedges.rows_per_shard, d)).astype(np.float32))
        results["boundary"][g] = timed(
            jax.jit(lambda h_, e=bedges, m=mesh: halo_rgcn_aggregate(
                m, h_, rel_emb, w, e)), hb)
        halo_stats[g] = {k: round(v, 4) if isinstance(v, float) else v
                         for k, v in stats.items()}

    report = {
        "metric": "halo_rgcn_edges_per_s",
        "platform": str(jax.devices()[0].platform),
        "halo_stats": {str(g): v for g, v in halo_stats.items()},
    }
    for variant, res in results.items():
        base = res.get(1)
        report[variant] = {
            str(g): {
                "edges_per_s": round(v, 1),
                "scaling_efficiency": round(v / (base * g), 3) if base else None,
            }
            for g, v in res.items()
        }
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
