"""Experiment: does shuffled snapshot order cost throughput vs sequential?

Same fused epoch_fn, same store — only the order vector differs.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer
    from regcn_tpu.train.epoch import build_snapshot_store

    data = generate("synthetic-icews14s", seed=123)
    cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                           h_dim=200, n_layers=2, encoder="hyperbolic_uvrgcn",
                           decoder="hyperbolic_convtranse")
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128)
    trainer = HyperbolicTrainer(cfg, tc, data)
    store = build_snapshot_store(
        trainer.train_list, trainer.num_nodes, trainer.num_rels,
        edge_bucket=128, rc_bucket=128, triple_bucket=128,
        pad_front=tc.train_history_len,
    )
    cmax = jnp.asarray(cfg.curvature_max, jnp.float32)

    seq = np.arange(1, len(trainer.train_list), dtype=np.int32)
    shuf = seq.copy()
    np.random.default_rng(0).shuffle(shuf)

    for name, order in (("sequential", seq), ("shuffled", shuf)):
        order = jnp.asarray(order)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, losses = trainer.epoch_fn(state, store, order, cmax)
        float(losses["entity"].mean())
        t0 = time.perf_counter()
        for _ in range(3):
            state, losses = trainer.epoch_fn(state, store, order, cmax)
            float(losses["entity"].mean())
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:12s} {dt:7.3f} s/epoch ({1e3 * dt / len(seq):6.3f} ms/snap)")


if __name__ == "__main__":
    main()
