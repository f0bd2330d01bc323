"""Per-encoder boundary-halo retention on the virtual mesh.

Round-4 companion to tools/bench_scaling.py: that harness measures the
SUM-path aggregation variants; this one times the full encoder cell
(``hyperbolic/layers.encoder_cell``) for each of the four hyperbolic
encoders, unsharded vs ``dist_agg='halo'`` at G = 2/4/8, on one
ICEWS-like snapshot. On the shared-host virtual CPU mesh the meaningful
number is RETENTION (T_1 / T_G as a time ratio, ideal 1.0 — see the
platform note in bench_scaling.py); comm volume is identical to the sum path's measured
halo stats because every encoder exchanges exactly the same source-row
halo (destination-local weighted segment reductions).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_encoder_halo.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N, R, D = 7128, 24, 128
E = 2048  # directed edges after inverses
NB, HEADS = 32, 2  # NB must divide D and stay <= 2R (lgcn basis clamp)
C = 0.01
ENCODERS = ("hyperbolic_uvrgcn", "fhnn", "lgcn", "hgat")


def _ensure_mesh():
    if os.environ.get("_REGCN_SCALING_CHILD") == "1":
        jax.config.update("jax_platforms", "cpu")
        return
    if len(jax.devices()) >= 2:
        return
    env = dict(os.environ)
    env["_REGCN_SCALING_CHILD"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _timed(fn, arg, steps=5, repeats=7):
    """Median-of-repeats per-call time (+ min/max across repeats).

    Round-5 methodology fix: a single 5-step average is noisy on a
    shared 2-core host (round 4's uvrgcn column was non-monotonic);
    the median over >=7 repeat rounds is robust to transient host load.
    """
    out = fn(arg)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(arg)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / steps)
    times.sort()
    return times[len(times) // 2], times[0], times[-1]


def main():
    _ensure_mesh()
    from regcn_tpu.data.snapshots import build_snapshot
    from regcn_tpu.dist import HaloImpl
    from regcn_tpu.hyperbolic import layers as HL
    from regcn_tpu.hyperbolic import ops as H
    from regcn_tpu.parallel.halo import partition_edges_boundary
    from regcn_tpu.parallel.mesh import MeshAxes, make_mesh

    rng = np.random.default_rng(0)
    triples = np.stack([
        rng.integers(0, N, E // 2), rng.integers(0, R, E // 2),
        rng.integers(0, N, E // 2),
    ], axis=1)
    snap = build_snapshot(triples, N, R, edge_bucket=256)
    h = H.exp_map_zero(
        jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 0.3), C)
    rel_emb = jnp.asarray(rng.normal(size=(2 * R, D)).astype(np.float32) * 0.3)

    report = {"metric": "encoder_cell_forward_s (halo retention = T1/TG)",
              "platform": str(jax.devices()[0].platform),
              "host_cores": os.cpu_count(),
              "shape": {"N": N, "E": E, "d": D, "R": R}}
    for enc in ENCODERS:
        params = HL.init_encoder_cell(
            jax.random.PRNGKey(0), enc, D, 2 * R, n_layers=2,
            n_bases=NB, num_heads=HEADS)
        # params are TRACED arguments, as in the production trainers.
        # Round-4 captured them as jit closure constants, which let XLA
        # constant-fold fhnn's [E, d, d] weight gather in the DENSE
        # baseline but not inside shard_map — the 0.22-0.30 "retention
        # defect" was that asymmetry, not a halo cost (round-5 fix).
        base_fn = jax.jit(lambda hh, p, e=enc: HL.encoder_cell(
            p, e, hh, rel_emb, snap, C, n_bases=NB, num_heads=HEADS,
            impl="xla"))
        t1, t1_lo, t1_hi = _timed(lambda hh: base_fn(hh, params), h)
        row = {"t1_s": round(t1, 5),
               "t1_minmax_s": [round(t1_lo, 5), round(t1_hi, 5)],
               "halo": {}}
        for g in (2, 4, 8):
            if g > len(jax.devices()):
                break
            mesh = make_mesh(MeshAxes(data=1, graph=g),
                             devices=jax.devices()[:g])
            halo, stats = partition_edges_boundary(triples, N, R, g)
            snap_h = dataclasses.replace(snap, halo=halo)
            fn = jax.jit(lambda hh, p, e=enc, s=snap_h, m=mesh:
                         HL.encoder_cell(p, e, hh, rel_emb, s, C,
                                         n_bases=NB, num_heads=HEADS,
                                         impl=HaloImpl(m)))
            tg, tg_lo, tg_hi = _timed(lambda hh: fn(hh, params), h)
            row["halo"][str(g)] = {
                "tG_s": round(tg, 5),
                "tG_minmax_s": [round(tg_lo, 5), round(tg_hi, 5)],
                "retention": round(t1 / tg, 3),
                "boundary_fraction_of_N": round(
                    stats["boundary_fraction_of_N"], 4),
            }
        report[enc] = row
        print(enc, json.dumps(row), flush=True)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
