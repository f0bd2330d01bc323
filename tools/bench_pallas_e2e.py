"""End-to-end headline-epoch comparison of the scatter backends.

Round-4 re-measure of the round-3 verdict "Pallas scatter loses e2e
(242 vs 331 snaps/s)": that number was taken with a per-layer on-device
``jnp.argsort(dst_key)`` inside the traced step. Snapshot edge lists are
now destination-sorted at build time (Snapshot.dst_sorted), so the
kernel runs without the avoidable in-step work. Times the fused
training epoch of the headline config (hyperbolic uvrgcn+convtranse,
h200, ICEWS14s shape, bf16) for impl in {xla, pallas}.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_pallas_e2e.py
"""

from __future__ import annotations

import json
import time

import jax


def bench(impl: str, epochs: int = 3):
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = generate("synthetic-icews14s", seed=123)
    cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                           h_dim=200, n_layers=2,
                           encoder="hyperbolic_uvrgcn",
                           decoder="hyperbolic_convtranse",
                           compute_dtype="bfloat16", impl=impl)
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128)
    tr = HyperbolicTrainer(cfg, tc, data)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, _ = tr.run_epoch(state, 0)  # compile
    times = []
    for ep in range(1, epochs + 1):
        t0 = time.perf_counter()
        state, losses = tr.run_epoch(state, ep)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    snaps = len(tr.train_list) - 1
    best = min(times)
    return {"impl": impl, "epoch_s": round(best, 4),
            "snaps_per_s": round(snaps / best, 1),
            "epochs_s_all": [round(t, 4) for t in times]}


def main():
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    rows = [bench("xla"), bench("pallas")]
    print(json.dumps({
        "metric": "headline_epoch_snaps_per_s (bf16, dst-sorted stores)",
        "device": str(jax.devices()[0]),
        "rows": rows,
        "pallas_vs_xla": round(rows[1]["snaps_per_s"] / rows[0]["snaps_per_s"], 3),
    }))


if __name__ == "__main__":
    main()
