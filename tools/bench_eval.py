"""Time the fused whole-split evaluation at ICEWS14s scale (real TPU).

The reference's validation eval (30 snapshots, entity+relation,
raw+filtered MRR) takes ~4.6 s on its GPU (BASELINE.md); this measures
our one-device-call path.
"""

from __future__ import annotations

import time

import jax


def main():
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data.answers import build_answer_filters_by_time
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = generate("synthetic-icews14s", seed=123)
    cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                           h_dim=200, n_layers=2, encoder="hyperbolic_uvrgcn",
                           decoder="hyperbolic_convtranse")
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128)
    trainer = HyperbolicTrainer(cfg, tc, data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ent_f = build_answer_filters_by_time(data.valid, trainer.num_rels, False)
    rel_f = build_answer_filters_by_time(data.valid, trainer.num_rels, True)

    def run():
        return trainer.evaluate(state, trainer.train_list, trainer.valid_list,
                                ent_f, rel_f, cache_key="valid")

    stats = run()  # compile + cache
    t0 = time.perf_counter()
    for _ in range(3):
        stats = run()
    dt = (time.perf_counter() - t0) / 3
    n = len(trainer.valid_list)
    print(f"fused eval: {dt:.3f} s for {n} snapshots "
          f"(ent+rel, raw+filtered) -> {n / dt:.1f} snapshots/s; "
          f"MRR raw {stats['ent_raw'].mrr:.4f}")


if __name__ == "__main__":
    main()
