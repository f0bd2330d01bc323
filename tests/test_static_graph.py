"""Static entity-word graph constraint (ref:src/rrgcn.py:101-106,225-247)."""

import dataclasses

import jax
import numpy as np

from regcn_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from regcn_tpu.data.dataset import TKGData
from regcn_tpu.data.synthetic import generate
from regcn_tpu.train.loop import Trainer
from regcn_tpu.train.state import create_train_state


def _data_with_static(rng):
    data = generate("synthetic-small", seed=13, num_ents=50, num_rels=5,
                    num_snaps=12, triples_per_snap=30, split=(8, 2, 2))
    num_words, num_static_rels = 20, 3
    st = np.stack([
        rng.integers(0, data.num_nodes, 100),
        rng.integers(0, num_static_rels, 100),
        rng.integers(0, num_words, 100) + data.num_nodes,  # word ids offset
    ], axis=1)
    return TKGData(
        train=data.train, valid=data.valid, test=data.test,
        num_nodes=data.num_nodes, num_rels=data.num_rels,
        static_triples=st, num_static_rels=num_static_rels, num_words=num_words,
    )


def test_static_loss_active_and_finite(rng):
    data = _data_with_static(rng)
    cfg = ExperimentConfig(
        model=ModelConfig(
            num_ents=data.num_nodes, num_rels=data.num_rels, h_dim=20,
            use_static=True, num_static_rels=data.num_static_rels,
            num_words=data.num_words, n_bases=4, angle=10, discount=1.0,
            static_weight=0.5,
        ),
        train=TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                          n_epochs=1),
        data=DataConfig(),
    )
    trainer = Trainer(cfg, data)
    state = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state, losses = trainer.run_epoch(state, 0)
    assert np.isfinite(losses["static"])
    assert losses["static"] > 0.0  # angular constraint actually fires early
    # fused path also supports the static graph
    state2 = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    state2, losses2 = trainer.run_epoch_fused(state2, 0)
    assert np.isfinite(losses2["static"]) and losses2["static"] > 0.0
    # eval works with static graph
    stats = trainer.evaluate(state2, trainer.train_list, trainer.valid_list)
    assert np.isfinite(stats["ent_raw"].mrr)


def test_static_graph_bf16_carry_dtype():
    """Regression: with use_static, the fp32 in_deg_norm of the (un-cast)
    static snapshot promoted the whole evolution to fp32 under bf16
    compute, breaking the scan-carry dtype."""
    import jax
    import numpy as np

    from regcn_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from regcn_tpu.data.synthetic import generate
    from regcn_tpu.train.loop import Trainer
    from regcn_tpu.train.state import create_train_state

    data = generate("synthetic-small", seed=11, num_ents=50, num_rels=4,
                    num_snaps=8, triples_per_snap=30, split=(6, 1, 1),
                    with_static=True)
    cfg = ExperimentConfig(
        model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                          h_dim=16, n_layers=1, use_static=True,
                          num_static_rels=data.num_static_rels,
                          num_words=data.num_words, dtype="bfloat16",
                          n_bases=8),
        train=TrainConfig(train_history_len=2, test_history_len=2,
                          edge_bucket=32, rc_bucket=32, triple_bucket=32))
    tr = Trainer(cfg, data)
    st = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train)
    st, losses = tr.run_epoch_fused(st, 0)  # raised a scan dtype error before
    assert np.isfinite(losses["entity"])
    assert np.isfinite(losses["static"])
