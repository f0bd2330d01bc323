"""Experiment: does rematerializing the loss fn beat storing residuals?

The fused epoch's backward reads every residual the scan stored in HBM;
at ICEWS14s scale the model is bandwidth-bound, so recomputing the
forward during the backward (jax.checkpoint) may be cheaper. Times the
headline bench config both ways.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import optax


def main():
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.hyperbolic import model as hmodel
    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HypTrainState, HyperbolicTrainer

    data = generate("synthetic-icews14s", seed=123)
    cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                           h_dim=200, n_layers=2, encoder="hyperbolic_uvrgcn",
                           decoder="hyperbolic_convtranse")
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128)
    trainer = HyperbolicTrainer(cfg, tc, data)
    from regcn_tpu.train.epoch import window_snapshot

    opt = trainer.opt
    hlen = tc.train_history_len

    def make_epoch(remat_policy):
        def loss_fn(params, model_state, history, triples, mask, rng, cmax):
            _, losses, new_state, _ = hmodel.get_loss(
                params, model_state, cfg, history, triples, mask,
                rng=rng, train=True, curvature_max=cmax,
            )
            total = (tc.task_weight * losses["entity"]
                     + (1.0 - tc.task_weight) * losses["relation"]
                     + losses["static"] + losses["radius"])
            return total, (losses, new_state)

        if remat_policy is not None:
            loss_fn = jax.checkpoint(loss_fn, policy=remat_policy)

        def epoch_fn(state, store, order, cmax):
            def body(st, i):
                history = window_snapshot(store, i - hlen, hlen)
                triples = store.triples[i]
                mask = store.triple_mask[i]
                rng, step_rng = jax.random.split(st.rng)
                grads, (losses, new_ms) = jax.grad(loss_fn, has_aux=True)(
                    st.params, st.model_state, history, triples, mask,
                    step_rng, cmax)
                updates, new_opt = opt.update(grads, st.opt_state, st.params)
                new_params = optax.apply_updates(st.params, updates)
                return HypTrainState(params=new_params, opt_state=new_opt,
                                     model_state=new_ms, est_state=st.est_state,
                                     rng=rng, step=st.step + 1), losses
            return jax.lax.scan(body, state, order)

        return jax.jit(epoch_fn, donate_argnums=(0,))

    import numpy as np

    from regcn_tpu.train.epoch import build_snapshot_store

    store = build_snapshot_store(trainer.train_list, trainer.num_nodes,
                                 trainer.num_rels, edge_bucket=128,
                                 rc_bucket=128, triple_bucket=128)
    order = jnp.asarray(np.arange(hlen, len(trainer.train_list)), jnp.int32)
    cmax = jnp.asarray(cfg.curvature_max, jnp.float32)

    policies = [
        ("no remat (baseline)", None),
        ("full remat", jax.checkpoint_policies.nothing_saveable),
        ("save dots", jax.checkpoint_policies.dots_saveable),
        ("save dots-no-batch", jax.checkpoint_policies.dots_with_no_batch_dims_saveable),
    ]
    for name, pol in policies:
        epoch_fn = make_epoch(pol)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, losses = epoch_fn(state, store, order, cmax)  # compile+warm
        float(losses["entity"].mean())
        t0 = time.perf_counter()
        for _ in range(3):
            state, losses = epoch_fn(state, store, order, cmax)
            float(losses["entity"].mean())
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:28s} {dt:7.3f} s/epoch  ({1e3 * dt / len(order):6.3f} ms/snap)"
              f"  loss {float(losses['entity'].mean()):.4f}")


if __name__ == "__main__":
    main()
