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


def test_fused_eval_matches_per_snapshot_spec(tiny_experiment):
    """evaluate_fused (one scan over the split) must reproduce the
    per-snapshot rolling-window evaluation computed independently on the
    host (predict per snapshot + numpy ranks + AnswerFilter masking)."""
    from regcn_tpu.data.answers import build_answer_filters_by_time
    from regcn_tpu.data.snapshots import pad_triples
    from regcn_tpu.train import metrics

    trainer, fresh_state = tiny_experiment
    state = fresh_state()
    state, _ = trainer.run_epoch(state, epoch=0)
    tc = trainer.cfg.train
    ent_f = build_answer_filters_by_time(trainer.data.valid, trainer.num_rels, False)
    rel_f = build_answer_filters_by_time(trainer.data.valid, trainer.num_rels, True)

    fused = trainer.evaluate_fused(
        state, trainer.train_list, trainer.valid_list, ent_f, rel_f)

    # independent per-snapshot spec
    window = list(trainer.train_list[-tc.test_history_len:])
    ranks = {"ent_raw": [], "ent_filter": [], "rel_raw": [], "rel_filter": []}
    for t, snap in enumerate(trainer.valid_list):
        history = trainer._history(window)
        triples, mask = pad_triples(snap, trainer.num_rels, tc.triple_bucket)
        s_ob, s_rel = trainer.predict_step(state, history, triples, mask)
        valid = mask > 0
        s_ob = np.asarray(s_ob, np.float64)[valid]
        s_rel = np.asarray(s_rel, np.float64)[valid]
        tq = triples[valid]
        ranks["ent_raw"].append(metrics.ranks_from_scores(s_ob, tq[:, 2]))
        ranks["ent_filter"].append(
            metrics.filtered_ranks(s_ob, tq[:, [0, 1]], tq[:, 2], ent_f[t]))
        ranks["rel_raw"].append(metrics.ranks_from_scores(s_rel, tq[:, 1]))
        ranks["rel_filter"].append(
            metrics.filtered_ranks(s_rel, tq[:, [0, 2]], tq[:, 1], rel_f[t]))
        window.pop(0)
        window.append(snap)
    spec = {k: metrics.stat_ranks(v) for k, v in ranks.items()}

    for key in fused:
        assert fused[key].count == spec[key].count
        np.testing.assert_allclose(fused[key].mrr, spec[key].mrr, rtol=1e-5)
        for k in (1, 3, 10):
            np.testing.assert_allclose(fused[key].hits[k], spec[key].hits[k],
                                       rtol=1e-6, atol=1e-9)


def test_fused_eval_short_history_front_pad(tiny_experiment):
    """A history list shorter than test_history_len must front-pad with
    identity snapshots and still produce finite, sane metrics."""
    trainer, fresh_state = tiny_experiment
    state = fresh_state()
    stats = trainer.evaluate_fused(
        state, trainer.train_list[:1], trainer.valid_list)
    assert 0 < stats["ent_raw"].mrr <= 1


def test_best_state_survives_donation():
    """fit() stashes the best-on-valid state; later epochs donate the
    live state's buffers, so the stash must be a deep copy. Regression:
    using the returned best state after a best!=last run crashed with a
    deleted-array/backend error."""
    import jax

    from regcn_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.train.loop import Trainer

    data = generate("synthetic-small", seed=9, num_ents=60, num_rels=5,
                    num_snaps=16, triples_per_snap=40, split=(12, 2, 2))
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=16, n_layers=1),
        train=TrainConfig(n_epochs=3, train_history_len=2,
                          test_history_len=2, edge_bucket=32, rc_bucket=32,
                          triple_bucket=32),
        data=DataConfig(),
    )
    trainer = Trainer(cfg, data)
    best, info = trainer.fit()
    deleted = [
        p for p, x in jax.tree_util.tree_flatten_with_path(best)[0]
        if isinstance(x, jax.Array) and x.is_deleted()
    ]
    assert not deleted, deleted
    # and the stashed state is actually usable
    stats = trainer.test(best)
    assert stats["ent_raw"].mrr > 0.0

    # deterministic core of the bug: a bare reference is destroyed by the
    # next (donating) epoch, a copy_state stash survives
    from regcn_tpu.train.state import copy_state, create_train_state

    state = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state, _ = trainer.run_epoch_fused(state, 0)
    bare, stash = state, copy_state(state)
    state, _ = trainer.run_epoch_fused(state, 1)  # donates `bare`'s buffers
    assert any(isinstance(x, jax.Array) and x.is_deleted()
               for x in jax.tree.leaves(bare))
    assert not any(isinstance(x, jax.Array) and x.is_deleted()
                   for x in jax.tree.leaves(stash))


def test_fit_resume_continues_from_checkpoint(tmp_path):
    """fit(resume=True) restores params+optimizer+epoch and continues —
    the full-state resume the reference lacks (it saves bare state_dict)."""
    import jax

    from regcn_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.train.loop import Trainer

    data = generate("synthetic-small", seed=9, num_ents=60, num_rels=5,
                    num_snaps=16, triples_per_snap=40, split=(12, 2, 2))

    def make(n_epochs):
        cfg = ExperimentConfig(
            model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                              h_dim=16, n_layers=1),
            train=TrainConfig(n_epochs=n_epochs, train_history_len=2,
                              test_history_len=2, edge_bucket=32,
                              rc_bucket=32, triple_bucket=32),
            data=DataConfig(),
        )
        return Trainer(cfg, data)

    ckpt = str(tmp_path / "ckpt")
    t1 = make(2)
    best1, info1 = t1.fit(checkpoint_path=ckpt)

    # resume in a fresh trainer with a higher epoch budget
    t2 = make(4)
    best2, info2 = t2.fit(checkpoint_path=ckpt, resume=True)
    epochs_run = [r["epoch"] for r in info2["history"]]
    assert epochs_run and min(epochs_run) >= 2, epochs_run  # continued, not restarted
    assert info2["best_valid_mrr_raw"] >= info1["best_valid_mrr_raw"] - 1e-9
    stats = t2.test(best2)
    assert stats["ent_raw"].mrr > 0.0
