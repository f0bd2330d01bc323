"""Per-component timing ablation for the headline hyperbolic benchmark.

Times the fused whole-epoch scan (bench.py's configuration) with
individual model components disabled, so the cost of each is the delta
vs the full config. Run on the real TPU:

    python tools/perf_ablate.py

Each row prints epoch seconds and ms/snapshot for one ablation.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp


def time_epochs(trainer, n_epochs=3):
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.run_epoch(state, 0)  # compile + warmup
    t0 = time.perf_counter()
    for e in range(n_epochs):
        state, _ = trainer.run_epoch(state, e + 1)
    return (time.perf_counter() - t0) / n_epochs


def main():
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = generate("synthetic-icews14s", seed=123)
    base = dict(num_ents=data.num_nodes, num_rels=data.num_rels, h_dim=200,
                n_layers=2, encoder="hyperbolic_uvrgcn",
                decoder="hyperbolic_convtranse")
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128)

    ablations = [
        ("full (bench config)", {}),
        ("no entity decoder", {"entity_prediction": False}),
        ("no relation decoder", {"relation_prediction": False}),
        ("no decoders", {"entity_prediction": False, "relation_prediction": False}),
        ("no radius evolution", {"use_residual_evolution": False}),
        ("1 encoder layer", {"n_layers": 1}),
        ("no dropout", {"dropout": 0.0, "input_dropout": 0.0,
                        "hidden_dropout": 0.0, "feat_dropout": 0.0}),
        ("ball-space scan (no tangent fast path)", {"_ball": True}),
    ]

    n_snaps = None
    for name, overrides in ablations:
        ball = overrides.pop("_ball", False)
        cfg = HyperbolicConfig(**{**base, **overrides})
        trainer = HyperbolicTrainer(cfg, tc, data)
        if ball:
            # rebuild the fused epoch with the ball-space reference scan
            import regcn_tpu.hyperbolic.model as hm

            orig = hm.evolve

            def forced(*a, **k):
                k["tangent_fast"] = False
                return orig(*a, **k)

            hm.evolve = forced
            try:
                trainer = HyperbolicTrainer(cfg, tc, data)
                dt = time_epochs(trainer)
            finally:
                hm.evolve = orig
        else:
            dt = time_epochs(trainer)
        if n_snaps is None:
            n_snaps = len(trainer.train_list) - 1
        print(f"{name:42s} {dt:7.3f} s/epoch  {1e3 * dt / n_snaps:7.3f} ms/snap")


if __name__ == "__main__":
    main()
