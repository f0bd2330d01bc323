"""Backward/optimizer cost breakdown for the headline hyperbolic bench.

perf_ablate.py showed: full epoch 1.29 s, forward-only (no decoders → no
loss → XLA DCEs the whole backward) 0.11 s, and each decoder's own
fwd+bwd ≈ 0.15 s.  The residual ~0.87 s is shared backward + optimizer
work that only exists when some loss exists.  This tool splits that
residual by swapping the optimizer and by stopping gradients at the
encoder boundary.  Run on the real TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_bwd_breakdown.py
"""

from __future__ import annotations

import time

import jax
import optax


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
    import regcn_tpu.hyperbolic.model as hm
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    data = generate("synthetic-icews14s", seed=123)
    cfg = HyperbolicConfig(
        num_ents=data.num_nodes, num_rels=data.num_rels, h_dim=200,
        n_layers=2, encoder="hyperbolic_uvrgcn",
        decoder="hyperbolic_convtranse",
    )
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128)

    def make_trainer(opt=None, stop_encoder_grad=False):
        orig = hm.evolve
        if stop_encoder_grad:
            def stopped(*a, **k):
                out = orig(*a, **k)
                return jax.tree.map(
                    lambda x: jax.lax.stop_gradient(x) if x is not None else None,
                    out, is_leaf=lambda x: x is None)

            hm.evolve = stopped
        try:
            t = HyperbolicTrainer(cfg, tc, data)
            if opt is not None:
                t.opt = opt
                t._build_steps()
        finally:
            hm.evolve = orig
        return t

    rows = [
        ("full (clip + Adam + wd)", {}),
        ("plain SGD optimizer", {"opt": optax.sgd(1e-3)}),
        ("stop-grad at encoder (bwd = decoders only)",
         {"stop_encoder_grad": True}),
        ("stop-grad encoder + SGD",
         {"opt": optax.sgd(1e-3), "stop_encoder_grad": True}),
        ("adam, no clip", {"opt": optax.adam(1e-3)}),
    ]
    n_snaps = None
    for name, kw in rows:
        t = make_trainer(**kw)
        dt = time_epochs(t)
        if n_snaps is None:
            n_snaps = len(t.train_list) - 1
        print(f"{name:46s} {dt:7.3f} s/epoch  {1e3 * dt / n_snaps:7.3f} ms/snap")


if __name__ == "__main__":
    main()
