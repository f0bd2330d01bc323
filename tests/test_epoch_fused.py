"""The fused whole-epoch scan must match the per-step training path."""

import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from regcn_tpu.data.synthetic import generate
from regcn_tpu.train.epoch import build_snapshot_store, make_epoch_fn, window_snapshot
from regcn_tpu.train.loop import Trainer
from regcn_tpu.train.state import create_train_state


def _experiment(dropout=0.0):
    data = generate("synthetic-small", seed=9, num_ents=60, num_rels=5,
                    num_snaps=16, triples_per_snap=40, split=(12, 2, 2))
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=16, n_layers=2, dropout=dropout,
                          input_dropout=dropout, hidden_dropout=dropout,
                          feat_dropout=dropout),
        train=TrainConfig(train_history_len=3, edge_bucket=32, rc_bucket=32,
                          triple_bucket=32),
        data=DataConfig(),
    )
    return Trainer(cfg, data), data


def test_window_snapshot_matches_host_build():
    trainer, data = _experiment()
    tc = trainer.cfg.train
    store = build_snapshot_store(
        trainer.train_list, trainer.num_nodes, trainer.num_rels,
        edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket,
        triple_bucket=tc.triple_bucket,
    )
    # compare on-device window vs host-built history for index 5
    win = jax.jit(lambda s: window_snapshot(s, 2, 3))(store)
    host = trainer._history(trainer.train_list[2:5])
    # pad host arrays up to store padding for comparison
    E = store.src.shape[1]
    for f in ("src", "dst", "rel", "edge_mask"):
        h = getattr(host, f)
        w = np.asarray(getattr(win, f))
        np.testing.assert_array_equal(w[:, : h.shape[1]], h)
        assert np.all(np.asarray(win.edge_mask)[:, h.shape[1]:] == 0)
    np.testing.assert_allclose(np.asarray(win.in_deg_norm), host.in_deg_norm, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(win.has_in_edge), host.has_in_edge)


def test_fused_epoch_matches_per_step_path():
    """Same shuffles + deterministic model (dropout=0) -> same losses and
    final params whether the epoch runs per-step or as one scan."""
    trainer, data = _experiment(dropout=0.0)
    cfg, tc = trainer.cfg.model, trainer.cfg.train

    # per-step path over the exact order the fused path will use
    # (run_epoch_fused now covers EVERY index, short-history prefix
    # included, via empty front-pad identity snapshots)
    state_a = create_train_state(jax.random.PRNGKey(1), cfg, tc)
    hlen = tc.train_history_len
    order = np.arange(1, len(trainer.train_list), dtype=np.int32)
    np.random.default_rng(tc.seed + 0).shuffle(order)
    losses_a = []
    for i in order:
        lo = max(0, i - hlen)
        history = trainer._history(trainer.train_list[lo:i], cache_key=(lo, i))
        triples, mask = trainer._triples(i)
        state_a, losses = trainer.train_step(state_a, history, triples, mask)
        losses_a.append(float(losses["entity"]))

    # fused path: with dropout=0 the rng stream is inert, so the two paths
    # must agree numerically despite different padding sizes (all masked)
    state_b = create_train_state(jax.random.PRNGKey(1), cfg, tc)
    state_b, avg = trainer.run_epoch_fused(state_b, epoch=0)

    pa = jax.tree.leaves(state_a.params)
    pb = jax.tree.leaves(state_b.params)
    for a, b in zip(pa, pb):
        # tolerances allow accumulation-order noise from the different
        # padded shapes (per-window vs global bucket) and fusion orders
        # (per-step jit vs epoch scan, unrolled bodies) across 14 adam steps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=6e-4)
    # mean entity loss agrees
    np.testing.assert_allclose(np.mean(losses_a), avg["entity"], rtol=1e-4)


def test_bf16_compute_mode_tracks_fp32():
    """Euclidean bf16 compute mode: params stay fp32, loss trajectory
    within a few percent of fp32 (mirrors the hyperbolic-path test)."""
    data = generate("synthetic-small", seed=9, num_ents=60, num_rels=5,
                    num_snaps=16, triples_per_snap=40, split=(12, 2, 2))
    last = {}
    for dt in ("float32", "bfloat16"):
        cfg = ExperimentConfig(
            model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                              h_dim=16, n_layers=2, dropout=0.0,
                              input_dropout=0.0, hidden_dropout=0.0,
                              feat_dropout=0.0, dtype=dt),
            train=TrainConfig(train_history_len=3, edge_bucket=32,
                              rc_bucket=32, triple_bucket=32),
            data=DataConfig(),
        )
        trainer = Trainer(cfg, data)
        state = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
        losses = []
        for e in range(3):
            state, ls = trainer.run_epoch_fused(state, e)
            losses.append(float(np.mean(np.asarray(ls["entity"]))))
        assert losses[-1] < losses[0]
        assert np.asarray(state.params["dynamic_emb"]).dtype == np.float32
        last[dt] = losses[-1]
    np.testing.assert_allclose(last["bfloat16"], last["float32"], rtol=0.05)
