"""Benchmark: RE-GCN training-step throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: edge-messages/s through the RGCN layers during a full
training step (fwd+bwd+optimizer) on an ICEWS14s-shaped workload —
history window 3, 2 RGCN layers, h_dim 200, ConvTransE/R decoders, same
as the reference's benchmark config (BASELINE.md). Edge-messages per
step = E_real * history_len * n_layers (forward), matching the
reference's accounting (~1.5-2e6 msg/s on its 2020-era GPU at ~0.2
s/snapshot — BASELINE.md note).
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main():
    from regcn_tpu.config import ModelConfig, TrainConfig
    from regcn_tpu.data.snapshots import build_history, pad_triples, split_by_time
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.train.loop import Trainer
    from regcn_tpu.config import ExperimentConfig
    from regcn_tpu.train.state import create_train_state

    data = generate("synthetic-icews14s", seed=123)
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=200, n_layers=2),
        train=TrainConfig(train_history_len=3, edge_bucket=1024,
                          rc_bucket=2048, triple_bucket=1024),
    )
    trainer = Trainer(cfg, data)
    state = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)

    tc = cfg.train
    # fixed window of steady-state snapshots
    steps = list(range(tc.train_history_len + 1, min(60, len(trainer.train_list))))
    batches = []
    real_edges = []
    for i in steps:
        lo = i - tc.train_history_len
        history = trainer._history(trainer.train_list[lo:i], cache_key=(lo, i))
        triples, mask = trainer._triples(i)
        batches.append((history, triples, mask))
        real_edges.append(
            sum(2 * len(t) for t in trainer.train_list[lo:i])
        )

    # warmup/compile
    for history, triples, mask in batches[:3]:
        state, losses = trainer.train_step(state, history, triples, mask)
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    total_edges = 0
    n_steps = 0
    for (history, triples, mask), e in zip(batches[3:], real_edges[3:]):
        state, losses = trainer.train_step(state, history, triples, mask)
        total_edges += e * cfg.model.n_layers
        n_steps += 1
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    edges_per_s = total_edges / dt
    snaps_per_s = n_steps / dt
    baseline_edges_per_s = 1.75e6  # reference GPU anchor (BASELINE.md)
    print(json.dumps({
        "metric": "rgcn_train_edge_messages_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edge-messages/s (fwd, during full train step)",
        "vs_baseline": round(edges_per_s / baseline_edges_per_s, 3),
        "extra": {
            "snapshots_per_s": round(snaps_per_s, 2),
            "s_per_snapshot": round(1.0 / snaps_per_s, 4),
            "device": str(jax.devices()[0]),
            "n_steps": n_steps,
        },
    }))


if __name__ == "__main__":
    main()
