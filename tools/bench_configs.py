"""Benchmark the five BASELINE.json reference configurations.

Measures fused-epoch training throughput (3 timed epochs after a compile
epoch) and, where cheap, a 5-epoch validation MRR, on real hardware:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_configs.py

1. RE-GCN baseline, ICEWS14s shape (2-layer RGCN, h200, hist 3, ConvTransE)
2. RE-GCN + static-graph constraint, ICEWS18 shape (23k entities)
3. Hyperbolic LGCN encoder + RotH decoder, c=0.01, radius supervision
4. Hyperbolic AttH decoder, learned curvature
5. EST-augmented hyperbolic (H-PES + ETNR K=32 + QCHHE GRU + TANS), GDELT shape
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def time_epochs(run_epoch, state, n=3, first_out=None):
    state, _ = run_epoch(state, 0)
    t0 = time.perf_counter()
    for e in range(n):
        state, losses = run_epoch(state, e + 1)
    dt = (time.perf_counter() - t0) / n
    return dt, state


def bench_euclidean(name, *, use_static=False, h_dim=200, hlen=3, epochs=5,
                    compute_dtype="float32"):
    from regcn_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from regcn_tpu.data import load_data
    from regcn_tpu.train.loop import Trainer
    from regcn_tpu.train.state import create_train_state

    data = load_data(name, load_static=use_static)
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=h_dim, n_layers=2, use_static=use_static,
                          num_static_rels=data.num_static_rels,
                          num_words=data.num_words, dtype=compute_dtype),
        train=TrainConfig(train_history_len=hlen, test_history_len=hlen,
                          edge_bucket=128, rc_bucket=128, triple_bucket=128,
                          n_epochs=epochs, lr=1e-3),
    )
    trainer = Trainer(cfg, data)
    st = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    dt, st = time_epochs(lambda s, e: trainer.run_epoch_fused(s, e), st)
    n_snaps = len(trainer.train_list) - 1
    mrr = None
    if epochs:
        best, info = trainer.fit()
        stats = trainer.test(best)
        mrr = (stats["ent_raw"].mrr, stats["ent_filter"].mrr)
    return dict(epoch_s=round(dt, 3), snaps_per_s=round(n_snaps / dt, 1),
                test_mrr_raw=mrr and round(mrr[0], 4),
                test_mrr_filter=mrr and round(mrr[1], 4))


def bench_hyperbolic(name, *, encoder, decoder, epochs=5, **cfg_kw):
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data import load_data
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = load_data(name)
    cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                           h_dim=200, n_layers=2, encoder=encoder,
                           decoder=decoder, **cfg_kw)
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128, n_epochs=epochs, lr=1e-3)
    trainer = HyperbolicTrainer(cfg, tc, data)
    st = trainer.init_state(jax.random.PRNGKey(0))
    dt, st = time_epochs(trainer.run_epoch, st)
    n_snaps = len(trainer.train_list) - 1
    out = dict(epoch_s=round(dt, 3), snaps_per_s=round(n_snaps / dt, 1))
    if epochs:
        best, info = trainer.fit(n_epochs=epochs)
        stats = trainer.test(best)
        out.update(test_mrr_raw=round(stats["ent_raw"].mrr, 4),
                   test_mrr_filter=round(stats["ent_filter"].mrr, 4))
    return out


def main():
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="1,2,3,4,5",
                    help="comma-separated subset of the 5 configs")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    which = {int(r) for r in args.rows.split(",")}
    cdt = args.compute_dtype

    rows = {}

    def emit(key, value):
        rows[key] = value
        print(json.dumps({key: value, "compute_dtype": cdt}), flush=True)

    if 1 in which:
        emit("1_regcn_icews14s",
             bench_euclidean("synthetic-icews14s", compute_dtype=cdt))
    if 2 in which:
        emit("2_regcn_static_icews18",
             bench_euclidean("synthetic-icews18", use_static=True,
                             compute_dtype=cdt))
    if 3 in which:
        emit("3_hyp_lgcn_roth",
             bench_hyperbolic("synthetic-icews14s", encoder="lgcn",
                              decoder="roth", c=0.01, compute_dtype=cdt))
    if 4 in which:
        emit("4_hyp_atth_learned_c",
             bench_hyperbolic("synthetic-icews14s",
                              encoder="hyperbolic_uvrgcn", decoder="atth",
                              learn_curvature=True, use_rel_curvature=True,
                              use_entity_bias=True, compute_dtype=cdt))
    if 5 in which:
        emit("5_est_gdelt",
             bench_hyperbolic("synthetic-gdelt", encoder="hyperbolic_uvrgcn",
                              decoder="hyperbolic_convtranse", use_est=True,
                              use_time_aware_negative=True, compute_dtype=cdt))
    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
