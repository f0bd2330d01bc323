"""Config-2 bf16 quality validation (round-4 perf follow-up).

docs/BENCHMARKS.md's config-2 trace paragraph measured the ICEWS18+static
step HBM-bandwidth-bound and bf16 worth +19% (35.5 -> 42.1 snaps/s), but
kept fp32 as the table row because bf16 quality at THIS config (static
word-graph constraint, 23k entities) had no dedicated run — the
convergence evidence covered the flagship hyperbolic path only.

This runs the config-2 shape (synthetic-icews18 twin + static word
graph, h200 L2 hist3 — BASELINE.json config 2 / ref:src/main.py
--add-static-graph) for N epochs in bf16 and fp32 on identical data and
seeds, and prints both valid-MRR trajectories + final test MRR. Pass =
bf16 tracks fp32 within the measured seed sigma (0.0002-0.0036,
BENCHMARKS.md round-3 seed-variance table).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/convergence_static18.py \
        [--n-epochs 25] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def run_one(dtype: str, seed: int, n_epochs: int) -> dict:
    from regcn_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from regcn_tpu.data import load_data
    from regcn_tpu.train.loop import Trainer

    data = load_data("synthetic-icews18", load_static=True)
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=200, n_layers=2, use_static=True,
                          num_static_rels=data.num_static_rels,
                          num_words=data.num_words, dtype=dtype),
        train=TrainConfig(train_history_len=3, test_history_len=3,
                          edge_bucket=128, rc_bucket=128, triple_bucket=128,
                          n_epochs=n_epochs, lr=1e-3, seed=seed),
    )
    trainer = Trainer(cfg, data)
    t0 = time.time()
    best, info = trainer.fit()
    wall = time.time() - t0
    stats = trainer.test(best)
    return {
        "dtype": dtype,
        "seed": seed,
        "best_valid_mrr_raw": round(info["best_valid_mrr_raw"], 4),
        "valid_trajectory": [round(r["valid_mrr_raw"], 4)
                             for r in info["history"]],
        "mean_epoch_s": round(sum(r["epoch_time_s"] for r in info["history"])
                              / max(len(info["history"]), 1), 2),
        "wall_clock_min": round(wall / 60.0, 2),
        "test_mrr_raw": round(stats["ent_raw"].mrr, 4),
        "test_mrr_filtered": round(stats["ent_filter"].mrr, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-epochs", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rows = []
    for dtype in ("bfloat16", "float32"):
        print(f"== {dtype}", flush=True)
        rows.append(run_one(dtype, args.seed, args.n_epochs))
        print(json.dumps(rows[-1]), flush=True)

    bf, fp = rows
    delta = round(bf["best_valid_mrr_raw"] - fp["best_valid_mrr_raw"], 4)
    print(json.dumps({
        "config": "RE-GCN + static graph, ICEWS18 shape (BASELINE config 2)",
        "delta_best_valid_bf16_minus_fp32": delta,
        "speedup_epoch": round(fp["mean_epoch_s"] / bf["mean_epoch_s"], 3),
        "verdict": ("bf16 within seed sigma" if abs(delta) <= 0.004
                    else "bf16 DIVERGES — keep fp32 row"),
        "rows": rows,
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
