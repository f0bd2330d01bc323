"""Benchmark: RE-GCN training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: RGCN edge-messages/s during full training (fwd+bwd+
optimizer, one optimizer step per snapshot) on an ICEWS14s-shaped
workload — history window 3, 2 RGCN layers, h_dim 200, ConvTransE/R
decoders, entity+relation losses: the reference's benchmark config
(BASELINE.md: ~0.2 s/snapshot => ~1.5-2e6 edge-messages/s on a
2020-era GPU). Edge-messages per step = sum(window real edges) * n_layers.

Uses the fused whole-epoch path (device-resident snapshot store +
lax.scan): the TPU-native execution model of this framework.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    from regcn_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.train.loop import Trainer
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
    hlen = tc.train_history_len
    store, epoch_fn = trainer._ensure_store()
    full = np.arange(hlen, len(trainer.train_list), dtype=np.int32)

    # real (unpadded) edge-messages per epoch over the scanned indices
    real_edges = sum(
        sum(2 * len(trainer.train_list[j]) for j in range(i - hlen, i))
        for i in full
    ) * cfg.model.n_layers

    # warmup/compile; fetch a scalar to fully sync (block_until_ready is
    # not a reliable fence over the remote-tunnel platform)
    order = jnp.asarray(full)
    state, losses = epoch_fn(state, store, order)
    float(losses["entity"].mean())

    n_epochs = 3
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        state, losses = epoch_fn(state, store, order)
    float(losses["entity"].mean())
    dt = time.perf_counter() - t0

    edges_per_s = real_edges * n_epochs / dt
    snaps_per_s = len(full) * n_epochs / dt
    # Reference anchor: ~0.2 s/snapshot full train step on its GPU for this
    # exact workload shape (BASELINE.md epoch lines: 62s / 303 snapshots)
    baseline_snaps_per_s = 5.0
    print(json.dumps({
        "metric": "train_snapshots_per_s",
        "value": round(snaps_per_s, 2),
        "unit": "snapshots/s (full train step: fwd+bwd+adam, ICEWS14s shape)",
        "vs_baseline": round(snaps_per_s / baseline_snaps_per_s, 2),
        "extra": {
            "s_per_snapshot": round(1.0 / snaps_per_s, 5),
            "edge_messages_per_s": round(edges_per_s, 1),
            "epoch_s": round(dt / n_epochs, 3),
            "device": str(jax.devices()[0]),
            "snapshots_per_epoch": int(len(full)),
        },
    }))


if __name__ == "__main__":
    main()
