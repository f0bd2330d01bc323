"""bf16 quality validation for the non-uvrgcn hyperbolic configs.

Round-4 verdict weak item #2: the bf16 crash for the fhnn/lgcn/hgat
encoders was fixed in round 4's last commit, so bf16 convergence
evidence existed only for the flagship (uvrgcn+convtranse) and config 2.
This runs the convergence protocol of tools/convergence_static18.py for

- config 3: lgcn encoder + RotH decoder, ICEWS14s-shape twin
- config 4: AttH + learned/relation-specific curvature + entity bias
  (whose bf16 path round 5 fixed: strong-f32 curvature promotion)
- config 5: EST stack (H-PES + ETNR K=32 + QCHHE GRU + TANS),
  GDELT-shape twin (truncated epochs — the 2303-snapshot epoch is
  ~30 s, see docs/BENCHMARKS.md)

in bf16 AND fp32 on identical data/seed and prints both valid-MRR
trajectories + final test MRR. Pass = bf16 tracks fp32 within the
measured seed sigma (BENCHMARKS.md round-3 seed-variance table).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/convergence_hyp_bf16.py \
        --config 3 [--n-epochs 25] [--seed 2023]
"""

from __future__ import annotations

import argparse
import json
import time

import jax

CONFIGS = {
    3: dict(dataset="synthetic-icews14s", encoder="lgcn", decoder="roth",
            default_epochs=25, cfg_kw=dict(c=0.01)),
    4: dict(dataset="synthetic-icews14s", encoder="hyperbolic_uvrgcn",
            decoder="atth", default_epochs=25,
            cfg_kw=dict(learn_curvature=True, use_rel_curvature=True,
                        use_entity_bias=True)),
    5: dict(dataset="synthetic-gdelt", encoder="hyperbolic_uvrgcn",
            decoder="hyperbolic_convtranse", default_epochs=8,
            cfg_kw=dict(use_est=True, use_time_aware_negative=True)),
}


def run_one(spec, dtype: str, seed: int, n_epochs: int) -> dict:
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data import load_data
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = load_data(spec["dataset"])
    cfg = HyperbolicConfig(
        num_ents=data.num_nodes, num_rels=data.num_rels, h_dim=200,
        n_layers=2, encoder=spec["encoder"], decoder=spec["decoder"],
        compute_dtype=dtype, radius_msg_gamma=0.15, **spec["cfg_kw"])
    tc = TrainConfig(train_history_len=3, test_history_len=3,
                     edge_bucket=128, rc_bucket=128, triple_bucket=128,
                     n_epochs=n_epochs, lr=1e-3, seed=seed)
    trainer = HyperbolicTrainer(cfg, tc, data)
    t0 = time.time()
    best, info = trainer.fit(n_epochs=n_epochs, patience=n_epochs)
    wall = time.time() - t0
    stats = trainer.test(best)
    return {
        "dtype": dtype,
        "seed": seed,
        "best_valid_mrr_raw": round(info["best_valid_mrr_raw"], 4),
        "valid_trajectory": [round(r["valid_mrr_raw"], 4)
                             for r in info["history"]],
        "wall_clock_min": round(wall / 60.0, 2),
        "test_mrr_raw": round(stats["ent_raw"].mrr, 4),
        "test_mrr_filtered": round(stats["ent_filter"].mrr, 4),
        "test_rel_mrr_raw": round(stats["rel_raw"].mrr, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, choices=sorted(CONFIGS), required=True)
    ap.add_argument("--n-epochs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=2023)
    args = ap.parse_args()
    spec = CONFIGS[args.config]
    n_epochs = args.n_epochs or spec["default_epochs"]

    rows = []
    for dtype in ("bfloat16", "float32"):
        print(f"== config {args.config} {dtype}", flush=True)
        rows.append(run_one(spec, dtype, args.seed, n_epochs))
        print(json.dumps(rows[-1]), flush=True)

    bf, fp = rows
    delta = round(bf["best_valid_mrr_raw"] - fp["best_valid_mrr_raw"], 4)
    print(json.dumps({
        "config": args.config,
        "delta_best_valid_bf16_minus_fp32": delta,
        "verdict": ("bf16 within seed sigma" if abs(delta) <= 0.004
                    else "bf16 DIVERGES — keep fp32 row"),
        "rows": rows,
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()


