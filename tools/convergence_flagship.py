"""Flagship-scale convergence protocol (round-2 verdict item #2).

Patience-20 fit of the headline configuration (hyperbolic_uvrgcn +
hyperbolic ConvTransE, h200, 2 layers, history 3/3, layer_norm, c=0.01,
lr 1e-3 — the configuration of ref:hyperbolic_src/train.log) on the
ICEWS14s-SHAPE synthetic twin (7,128 entities, 230 relations,
304/30/31 snapshots), multiple seeds, recording:

  best-valid raw MRR, epoch-to-best, epochs run, total wall-clock
  (train + per-epoch eval), and final test MRR raw/filtered.

The reference's own artifact for this config is
ref:hyperbolic_src/train.log: best valid 0.4119 @ epoch 17, 38 epochs,
42.6 min on its GPU — on the REAL ICEWS14s (its data tarball is absent
from the mount, so absolute MRRs are not comparable across datasets;
epochs-to-converge and wall-clock are the protocol anchors, and the
SMALL-twin refrun table in docs/BENCHMARKS.md pins quality parity on
identical data).

    python tools/convergence_flagship.py [--seeds 0 1 2] [--fp32-seed 0]
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def run_one(seed: int, compute_dtype: str, n_epochs: int = 100,
            patience: int = 20) -> dict:
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = generate("synthetic-icews14s", seed=123)  # same twin as bench.py
    cfg = HyperbolicConfig(
        num_ents=data.num_nodes, num_rels=data.num_rels, h_dim=200,
        n_layers=2, encoder="hyperbolic_uvrgcn",
        decoder="hyperbolic_convtranse", compute_dtype=compute_dtype,
    )
    tc = TrainConfig(train_history_len=3, test_history_len=3,
                     n_epochs=n_epochs, seed=seed,
                     edge_bucket=128, rc_bucket=128, triple_bucket=128)
    trainer = HyperbolicTrainer(cfg, tc, data)
    t0 = time.time()
    best, info = trainer.fit(
        state=trainer.init_state(jax.random.PRNGKey(seed)),
        n_epochs=n_epochs, patience=patience)
    wall = time.time() - t0
    stats = trainer.test(best)
    hist = info["history"]
    best_row = max(hist, key=lambda r: r["valid_mrr_raw"])
    return {
        "seed": seed,
        "compute_dtype": compute_dtype,
        "best_valid_mrr_raw": round(info["best_valid_mrr_raw"], 4),
        "best_epoch": best_row["epoch"],
        "epochs_run": len(hist),
        "wall_clock_min": round(wall / 60.0, 2),
        "mean_epoch_s": round(
            sum(r["epoch_time_s"] for r in hist) / max(len(hist), 1), 3),
        "test_mrr_raw": round(stats["ent_raw"].mrr, 4),
        "test_mrr_filtered": round(stats["ent_filter"].mrr, 4),
        "test_rel_mrr_raw": round(stats["rel_raw"].mrr, 4),
        "test_rel_mrr_filtered": round(stats["rel_filter"].mrr, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--fp32-seed", type=int, default=0,
                    help="additionally run this seed in fp32 (-1 to skip)")
    ap.add_argument("--n-epochs", type=int, default=100)
    ap.add_argument("--patience", type=int, default=20)
    args = ap.parse_args()

    rows = []
    for seed in args.seeds:
        print(f"== bf16 seed {seed}", flush=True)
        rows.append(run_one(seed, "bfloat16", args.n_epochs, args.patience))
        print(json.dumps(rows[-1]), flush=True)
    if args.fp32_seed >= 0:
        print(f"== fp32 seed {args.fp32_seed}", flush=True)
        rows.append(run_one(args.fp32_seed, "float32", args.n_epochs,
                            args.patience))
        print(json.dumps(rows[-1]), flush=True)

    import numpy as np

    bf = [r for r in rows if r["compute_dtype"] == "bfloat16"]
    summary = {
        "config": "hyperbolic_uvrgcn+convtranse h200 L2 hist3 (train.log cfg)",
        "dataset": "synthetic-icews14s twin (7128 ents, 304/30/31 snaps)",
        "reference_anchor": "ref:hyperbolic_src/train.log — 0.4119 best "
                            "valid @ epoch 17, 38 epochs, 42.6 min (GPU, "
                            "real ICEWS14s)",
        "bf16_best_valid_mean": round(float(np.mean(
            [r["best_valid_mrr_raw"] for r in bf])), 4),
        "bf16_best_valid_std": round(float(np.std(
            [r["best_valid_mrr_raw"] for r in bf])), 4),
        "bf16_test_raw_mean": round(float(np.mean(
            [r["test_mrr_raw"] for r in bf])), 4),
        "bf16_test_raw_std": round(float(np.std(
            [r["test_mrr_raw"] for r in bf])), 4),
        "rows": rows,
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
