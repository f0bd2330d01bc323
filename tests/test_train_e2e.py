"""End-to-end training smoke tests on the synthetic dataset (CPU)."""

import jax
import numpy as np
import pytest

from regcn_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from regcn_tpu.data.synthetic import generate
from regcn_tpu.train.loop import Trainer
from regcn_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def tiny_experiment():
    data = generate("synthetic-small", seed=5, num_ents=80, num_rels=8,
                    num_snaps=30, triples_per_snap=60, split=(22, 4, 4))
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=32, n_layers=2),
        train=TrainConfig(n_epochs=2, train_history_len=3, test_history_len=3,
                          edge_bucket=64, rc_bucket=64, triple_bucket=64, lr=1e-2),
        data=DataConfig(dataset="synthetic-small"),
    )
    trainer = Trainer(cfg, data)

    def fresh_state():
        # train_step donates its input state, so each test needs its own
        return create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)

    return trainer, fresh_state


def test_loss_decreases(tiny_experiment):
    trainer, fresh_state = tiny_experiment
    state = fresh_state()
    state, losses0 = trainer.run_epoch(state, epoch=0)
    for e in range(1, 4):
        state, losses = trainer.run_epoch(state, epoch=e)
    assert np.isfinite(losses["entity"])
    assert losses["entity"] < losses0["entity"]
    assert losses["relation"] < losses0["relation"]


def test_evaluate_produces_sane_metrics(tiny_experiment):
    trainer, fresh_state = tiny_experiment
    state = fresh_state()
    stats = trainer.evaluate(state, trainer.train_list, trainer.valid_list)
    for key in ("ent_raw", "ent_filter", "rel_raw", "rel_filter"):
        assert 0.0 < stats[key].mrr <= 1.0
        assert stats[key].hits[1] <= stats[key].hits[3] <= stats[key].hits[10]
    # filtered MRR can only be >= raw MRR
    assert stats["ent_filter"].mrr >= stats["ent_raw"].mrr - 1e-9


def test_checkpoint_roundtrip(tiny_experiment, tmp_path):
    from regcn_tpu.train.state import restore_checkpoint, save_checkpoint

    trainer, fresh_state = tiny_experiment
    state = fresh_state()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, {"epoch": 0})
    restored, meta = restore_checkpoint(path, state)
    leaves0 = jax.tree.leaves(state.params)
    leaves1 = jax.tree.leaves(restored.params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_inference_runs(tiny_experiment):
    trainer, fresh_state = tiny_experiment
    state = fresh_state()
    stats = trainer.evaluate(
        state, trainer.train_list, trainer.valid_list, multi_step=True, topk=5
    )
    assert np.isfinite(stats["ent_raw"].mrr)


def test_skip_connect_and_dilate(tiny_experiment):
    """skip-connect layers + dilated history train to finite losses."""
    import jax as _jax
    from regcn_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
    from regcn_tpu.data.synthetic import generate as _gen
    from regcn_tpu.train.loop import Trainer as _Trainer

    data = _gen("synthetic-small", seed=17, num_ents=60, num_rels=6,
                num_snaps=16, triples_per_snap=40, split=(12, 2, 2))
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=16, n_layers=2, skip_connect=True),
        train=TrainConfig(n_epochs=1, edge_bucket=64, rc_bucket=64,
                          triple_bucket=64, dilate_len=2),
        data=DataConfig(),
    )
    tr = _Trainer(cfg, data)
    assert len(tr.train_list) == 6  # 12 snapshots dilated by 2
    st = create_train_state(_jax.random.PRNGKey(0), cfg.model, cfg.train)
    st, losses = tr.run_epoch_fused(st, 0)
    assert np.isfinite(losses["entity"])
