"""End-to-end hyperbolic model tests: all encoders x decoders, trainer,
curvature learning, radius machinery, EST, TANS, Riemannian optimizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regcn_tpu.config import TrainConfig
from regcn_tpu.data import build_history, pad_triples
from regcn_tpu.data.snapshots import split_by_time
from regcn_tpu.data.synthetic import generate
from regcn_tpu.hyperbolic import model as hmodel
from regcn_tpu.hyperbolic.model import HyperbolicConfig
from regcn_tpu.hyperbolic.train import HyperbolicTrainer, compute_radius_targets


@pytest.fixture(scope="module")
def tiny_data():
    return generate("synthetic-small", seed=21, num_ents=60, num_rels=5,
                    num_snaps=14, triples_per_snap=40, split=(10, 2, 2))


def _cfg(data, **kw):
    base = dict(num_ents=data.num_nodes, num_rels=data.num_rels, h_dim=16,
                n_layers=2, n_bases=4, dropout=0.0)
    base.update(kw)
    return HyperbolicConfig(**base)


def _tc():
    return TrainConfig(edge_bucket=32, rc_bucket=32, triple_bucket=32,
                       train_history_len=3, test_history_len=3, n_epochs=2,
                       lr=5e-3)


@pytest.fixture(scope="module")
def batch(tiny_data):
    tl = split_by_time(tiny_data.train)
    history = build_history(tl[:3], tiny_data.num_nodes, tiny_data.num_rels,
                            edge_bucket=32, rc_bucket=32)
    triples, mask = pad_triples(tl[3], tiny_data.num_rels, 32)
    return history, jnp.asarray(triples), jnp.asarray(mask)


@pytest.mark.parametrize("encoder", hmodel.ENCODERS)
@pytest.mark.parametrize("decoder", hmodel.DECODERS)
def test_all_encoder_decoder_combos(tiny_data, batch, encoder, decoder):
    cfg = _cfg(tiny_data, encoder=encoder, decoder=decoder)
    params, state = hmodel.init_params(jax.random.PRNGKey(0), cfg)
    history, triples, mask = batch
    loss_ent, losses, new_state, aux = hmodel.get_loss(
        params, state, cfg, history, triples, mask,
        rng=jax.random.PRNGKey(1), train=True,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{encoder}/{decoder} {k} loss not finite"
    s_ob, s_rel = hmodel.predict(params, state, cfg, history, triples, mask)
    assert s_ob.shape == (len(triples), cfg.num_ents)
    assert s_rel.shape == (len(triples), cfg.num_rels_total)
    assert np.all(np.isfinite(np.asarray(s_ob)))


def test_learned_curvature_gets_gradients(tiny_data, batch):
    cfg = _cfg(tiny_data, learn_curvature=True, decoder="roth")
    params, state = hmodel.init_params(jax.random.PRNGKey(0), cfg)
    history, triples, mask = batch

    def loss(p):
        le, losses, _, _ = hmodel.get_loss(p, state, cfg, history, triples, mask, train=True)
        return losses["entity"] + losses["relation"]

    grads = jax.grad(loss)(params)
    assert abs(float(grads["log_c"])) > 0, "curvature gradient is dead"


def test_radius_supervision_pulls_static_radius(tiny_data, batch):
    cfg = _cfg(tiny_data)
    rt = compute_radius_targets(split_by_time(tiny_data.train), tiny_data.num_nodes)
    assert rt.shape == (tiny_data.num_nodes,)
    assert rt.min() >= cfg.radius_min - 1e-6 and rt.max() <= cfg.radius_max + 1e-6
    params, state = hmodel.init_params(jax.random.PRNGKey(0), cfg, radius_target=rt)
    history, triples, mask = batch
    # perturb radius_static away from the target: loss_radius must be > 0
    params["radius_static"] = params["radius_static"] + 0.5
    _, losses, _, _ = hmodel.get_loss(params, state, cfg, history, triples, mask, train=True)
    assert float(losses["radius"]) > 0

    def rloss(p):
        _, ls, _, _ = hmodel.get_loss(p, state, cfg, history, triples, mask, train=True)
        return ls["radius"]

    g = jax.grad(rloss)(params)
    assert float(jnp.sum(jnp.abs(g["radius_static"]))) > 0


def test_hyperbolic_trainer_loss_decreases(tiny_data):
    cfg = _cfg(tiny_data, decoder="hyperbolic_convtranse")
    trainer = HyperbolicTrainer(cfg, _tc(), tiny_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, l0 = trainer.run_epoch(state, 0)
    for e in range(1, 4):
        state, losses = trainer.run_epoch(state, e)
    assert losses["entity"] < l0["entity"]
    stats = trainer.evaluate(state, trainer.train_list, trainer.valid_list)
    assert 0 < stats["ent_raw"].mrr <= 1


def test_trainer_with_est_and_tans(tiny_data):
    cfg = _cfg(tiny_data, use_est=True, use_time_aware_negative=True,
               est_history_len=8)
    trainer = HyperbolicTrainer(cfg, _tc(), tiny_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    slow_before = np.asarray(state.est_state.slow).copy()
    state, losses = trainer.run_epoch(state, 0)
    assert np.isfinite(losses["entity"])
    # H-PES slow state must have been written back
    assert not np.allclose(np.asarray(state.est_state.slow), slow_before)
    stats = trainer.evaluate(state, trainer.train_list, trainer.valid_list)
    assert np.isfinite(stats["ent_raw"].mrr)


def test_est_transformer_backbone(tiny_data):
    """QCHHE transformer backbone directly (cheaper than a full trainer
    compile; the GRU backbone is covered end-to-end above)."""
    from regcn_tpu.hyperbolic import est, ops as H

    cfg = _cfg(tiny_data, use_est=True, est_encoder="transformer", est_history_len=8)
    params = est.init_est_params(jax.random.PRNGKey(0), cfg)
    B, K, d = 6, 8, cfg.h_dim
    key = jax.random.PRNGKey(1)
    nb = H.exp_map_zero(0.1 * jax.random.normal(key, (B, K, d)), cfg.c)
    rl = H.exp_map_zero(0.1 * jax.random.normal(key, (B, K, d)), cfg.c)
    tm = H.exp_map_zero(0.1 * jax.random.normal(key, (B, K, d)), cfg.c)
    q = 0.1 * jax.random.normal(key, (B, d))
    mask = jnp.asarray(np.tri(B, K, 2, dtype=np.float32))  # varied valid counts
    ctx = est.history_encoder(params, cfg, nb, rl, tm, q, mask, cfg.c)
    assert ctx.shape == (B, d)
    assert np.all(np.isfinite(np.asarray(ctx)))
    norms = np.linalg.norm(np.asarray(ctx), axis=-1)
    assert np.all(norms < 1.0 / np.sqrt(cfg.c))

    def loss(p):
        return jnp.sum(est.history_encoder(p, cfg, nb, rl, tm, q, mask, cfg.c) ** 2)

    g = jax.grad(loss)(params)
    gn = sum(float(jnp.sum(x**2)) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_manifold_entities_riemannian_updates_stay_on_ball(tiny_data):
    cfg = _cfg(tiny_data, manifold_entities=True, decoder="roth")
    trainer = HyperbolicTrainer(cfg, _tc(), tiny_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.run_epoch(state, 0)
    norms = np.linalg.norm(np.asarray(state.params["dynamic_emb"]), axis=-1)
    assert np.all(norms < 1.0 / np.sqrt(cfg.c)), "entities left the ball"


def test_curvature_warmup_schedule(tiny_data):
    cfg = _cfg(tiny_data, learn_curvature=True)
    trainer = HyperbolicTrainer(cfg, _tc(), tiny_data, curvature_warmup_epochs=4)
    assert trainer._curvature_max(0) < trainer._curvature_max(3)
    assert trainer._curvature_max(10) == cfg.curvature_max


def test_hyperbolic_multi_step_inference(tiny_data):
    cfg = _cfg(tiny_data)
    trainer = HyperbolicTrainer(cfg, _tc(), tiny_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    stats = trainer.evaluate(
        state, trainer.train_list, trainer.valid_list,
        time_offset=len(trainer.train_list), multi_step=True, topk=5,
    )
    assert np.isfinite(stats["ent_raw"].mrr)


@pytest.mark.parametrize("train_mode", [False, True])
@pytest.mark.parametrize("residual", [True, False])
def test_tangent_fast_path_matches_ball_path(tiny_data, batch, train_mode, residual):
    """The tangent-carry uvrgcn scan (evolve tangent_fast=True) must be
    numerically equivalent to the ball-space reference scan — including
    train-mode dropout masks (same rng fold structure)."""
    history, triples, mask = batch
    cfg = _cfg(tiny_data, encoder="hyperbolic_uvrgcn",
               decoder="hyperbolic_convtranse",
               use_residual_evolution=residual,
               dropout=0.3 if train_mode else 0.0)
    rt = compute_radius_targets(split_by_time(tiny_data.train), tiny_data.num_nodes)
    params, state = hmodel.init_params(jax.random.PRNGKey(7), cfg, rt)
    rng = jax.random.PRNGKey(11) if train_mode else None

    h_b, h0_b, _, all_b = hmodel.evolve(
        params, cfg, history, rng=rng, train=train_mode, return_all=True,
        tangent_fast=False)
    h_f, h0_f, _, all_f = hmodel.evolve(
        params, cfg, history, rng=rng, train=train_mode, return_all=True,
        tangent_fast=True)

    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_b),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h0_f), np.asarray(h0_b),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(all_f), np.asarray(all_b),
                               rtol=2e-4, atol=2e-5)


def test_tangent_fast_path_gradients_match(tiny_data, batch):
    history, triples, mask = batch
    cfg = _cfg(tiny_data, encoder="hyperbolic_uvrgcn",
               decoder="hyperbolic_convtranse")
    rt = compute_radius_targets(split_by_time(tiny_data.train), tiny_data.num_nodes)
    params, state = hmodel.init_params(jax.random.PRNGKey(3), cfg, rt)

    def loss(p, fast):
        h, h0, _, _ = hmodel.evolve(p, cfg, history, train=False,
                                    tangent_fast=fast)
        return jnp.sum(h * h) + jnp.sum(h0 ** 2)

    g_b = jax.grad(lambda p: loss(p, False))(params)
    g_f = jax.grad(lambda p: loss(p, True))(params)

    def check(path, vb, vf):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vb),
                                   rtol=5e-3, atol=1e-4, err_msg=str(path))

    jax.tree_util.tree_map_with_path(check, g_b, g_f)


def test_hyperbolic_fused_eval_matches_per_snapshot(tiny_data):
    """evaluate_fused must reproduce the per-snapshot rolling evaluation
    (independent host spec via predict_step + numpy ranks)."""
    from regcn_tpu.data.answers import build_answer_filters_by_time
    from regcn_tpu.train import metrics

    cfg = _cfg(tiny_data, decoder="hyperbolic_convtranse")
    trainer = HyperbolicTrainer(cfg, _tc(), tiny_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.run_epoch(state, 0)
    ent_f = build_answer_filters_by_time(tiny_data.valid, trainer.num_rels, False)
    rel_f = build_answer_filters_by_time(tiny_data.valid, trainer.num_rels, True)

    fused = trainer.evaluate_fused(
        state, trainer.train_list, trainer.valid_list, ent_f, rel_f)

    tc = trainer.tc
    window = list(trainer.train_list[-tc.test_history_len:])
    ranks = {"ent_raw": [], "ent_filter": [], "rel_raw": [], "rel_filter": []}
    for t, snap in enumerate(trainer.valid_list):
        history = trainer._history(window)
        triples, mask = pad_triples(snap, trainer.num_rels, tc.triple_bucket)
        s_ob, s_rel = trainer.predict_step(
            state, history, jnp.asarray(triples), jnp.asarray(mask))
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


def test_front_padded_fused_epoch_matches_per_step(tiny_data):
    """With dropout=0, the fused epoch (which now includes short-history
    prefix indices via empty identity pad snapshots) must match the
    per-step path exactly on losses and final params."""
    import optax

    cfg = _cfg(tiny_data, decoder="hyperbolic_convtranse",
               input_dropout=0.0, hidden_dropout=0.0, feat_dropout=0.0)
    tc = _tc()
    trainer = HyperbolicTrainer(cfg, tc, tiny_data)

    # per-step: same shuffled order as run_epoch's fused branch
    import random as _random

    idx = list(range(1, len(trainer.train_list)))
    _random.Random(tc.seed + 0).shuffle(idx)
    state_a = trainer.init_state(jax.random.PRNGKey(0))
    cmax = jnp.asarray(trainer._curvature_max(0), jnp.float32)
    losses_a = []
    for i in idx:
        lo = max(0, i - tc.train_history_len)
        history = trainer._history(trainer.train_list[lo:i], cache_key=(lo, i))
        triples, mask = pad_triples(trainer.train_list[i], trainer.num_rels,
                                    tc.triple_bucket)
        state_a, losses = trainer.train_step(
            state_a, history, jnp.asarray(triples), jnp.asarray(mask), cmax)
        losses_a.append(float(losses["entity"]))

    state_b = trainer.init_state(jax.random.PRNGKey(0))
    state_b, avg = trainer.run_epoch(state_b, 0)

    np.testing.assert_allclose(np.mean(losses_a), avg["entity"], rtol=1e-4)
    # param tolerance: the two paths reduce over different padded sizes
    # (per-window vs global store buckets), so identical math accumulates
    # in different orders; Adam's sqrt(v) division amplifies that fp noise
    # over the 11 steps (loss parity above is the semantic check)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_est_fused_epoch_and_eval_match_per_step(tiny_data):
    """The precomputed ESTStore path (fused epoch/eval scans) must
    reproduce the per-step host-retrieval path exactly: same retrieval
    arrays, same TANS masks, same losses/params/ranks."""
    from regcn_tpu.data.answers import build_answer_filters_by_time
    from regcn_tpu.hyperbolic import est as est_mod
    from regcn_tpu.train import metrics

    cfg = _cfg(tiny_data, use_est=True, use_time_aware_negative=True,
               est_history_len=8, input_dropout=0.0, hidden_dropout=0.0,
               feat_dropout=0.0)
    tc = _tc()
    trainer = HyperbolicTrainer(cfg, tc, tiny_data)

    import random as _random

    idx = list(range(1, len(trainer.train_list)))
    _random.Random(tc.seed + 0).shuffle(idx)
    cmax = jnp.asarray(trainer._curvature_max(0), jnp.float32)

    # per-step: host retrieval + per-snapshot TANS COO each step
    state_a = trainer.init_state(jax.random.PRNGKey(0))
    losses_a = []
    for i in idx:
        lo = max(0, i - tc.train_history_len)
        history = trainer._history(trainer.train_list[lo:i], cache_key=(lo, i))
        triples, mask = pad_triples(trainer.train_list[i], trainer.num_rels,
                                    tc.triple_bucket)
        rb = trainer._retrieval(triples, mask, i)
        rows, cols = est_mod.tans_mask_coo(triples, mask, trainer.true_tails)
        state_a, losses = trainer.train_step(
            state_a, history, jnp.asarray(triples), jnp.asarray(mask), cmax,
            rb, (jnp.asarray(rows), jnp.asarray(cols)))
        losses_a.append(float(losses["entity"]))

    # fused: run_epoch builds the ESTStore and scans the whole epoch
    state_b = trainer.init_state(jax.random.PRNGKey(0))
    state_b, mean_losses = trainer.run_epoch(state_b, 0)
    np.testing.assert_allclose(
        mean_losses["entity"], np.mean(losses_a), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state_b.params["dynamic_emb"]),
        np.asarray(state_a.params["dynamic_emb"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state_b.est_state.slow),
        np.asarray(state_a.est_state.slow), atol=2e-5)

    # eval: fused ESTStore ranks vs per-snapshot host retrieval ranks
    ent_f = build_answer_filters_by_time(tiny_data.valid, trainer.num_rels, False)
    rel_f = build_answer_filters_by_time(tiny_data.valid, trainer.num_rels, True)
    t_off = len(trainer.train_list)
    fused = trainer.evaluate_fused(state_b, trainer.train_list,
                                   trainer.valid_list, ent_f, rel_f,
                                   time_offset=t_off)
    window = list(trainer.train_list[-tc.test_history_len:])
    ranks = {"ent_raw": [], "ent_filter": []}
    for t, snap in enumerate(trainer.valid_list):
        history = trainer._history(window)
        triples, mask = pad_triples(snap, trainer.num_rels, tc.triple_bucket)
        rb = trainer._retrieval(triples, mask, t_off + t)
        s_ob, _ = trainer.predict_step(
            state_b, history, jnp.asarray(triples), jnp.asarray(mask), rb)
        valid = mask > 0
        s_ob = np.asarray(s_ob, np.float64)[valid]
        tq = triples[valid]
        ranks["ent_raw"].append(metrics.ranks_from_scores(s_ob, tq[:, 2]))
        ranks["ent_filter"].append(
            metrics.filtered_ranks(s_ob, tq[:, [0, 1]], tq[:, 2], ent_f[t]))
        window.pop(0)
        window.append(snap)
    spec = {k: metrics.stat_ranks(v) for k, v in ranks.items()}
    for key in spec:
        assert fused[key].count == spec[key].count
        np.testing.assert_allclose(fused[key].mrr, spec[key].mrr, rtol=1e-5)


def test_bf16_compute_mode_tracks_fp32(tiny_data):
    """bfloat16 compute mode: loss decreases and stays within a few
    percent of the fp32 trajectory (params/islands remain fp32)."""
    tc = _tc()
    last = {}
    for dt in ("float32", "bfloat16"):
        cfg = _cfg(tiny_data, compute_dtype=dt)
        trainer = HyperbolicTrainer(cfg, tc, tiny_data)
        state = trainer.init_state(jax.random.PRNGKey(0))
        losses = []
        for e in range(3):
            state, l = trainer.run_epoch(state, e)
            losses.append(l["entity"])
        assert losses[-1] < losses[0]
        assert np.asarray(state.params["dynamic_emb"]).dtype == np.float32
        last[dt] = losses[-1]
    np.testing.assert_allclose(last["bfloat16"], last["float32"], rtol=0.05)


@pytest.mark.parametrize("decoder", hmodel.DECODERS)
def test_no_weak_typed_params(tiny_data, decoder):
    """Weak-typed parameter leaves become strong after one optimizer
    step, changing their aval and silently recompiling the whole fused
    epoch program (~20 s wasted). Every param leaf must be strong."""
    cfg = _cfg(tiny_data, decoder=decoder, learn_curvature=True,
               use_rel_curvature=True, use_entity_bias=True, use_est=True)
    params, _ = hmodel.init_params(jax.random.PRNGKey(0), cfg)
    weak = [
        jax.tree_util.keystr(k)
        for k, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        if getattr(getattr(leaf, "aval", None), "weak_type", False)
    ]
    assert not weak, f"weak-typed param leaves: {weak}"


def test_triple_batch_accumulation_matches_manual_grad_sum(tiny_data):
    """--triple-batch-size reference parity (ref:hyperbolic_main.py:572-628):
    per-chunk grads SUM (each chunk's loss is its own mean, no rescaling),
    then clip + optimizer step ONCE per snapshot. The trainer's
    accum_grad_step/apply_accumulated pipeline must equal a hand-rolled
    jax.grad-per-chunk sum followed by one optax update."""
    from regcn_tpu.train.state import copy_state

    cfg = _cfg(tiny_data, decoder="hyperbolic_convtranse")
    tc = _tc()
    trainer = HyperbolicTrainer(cfg, tc, tiny_data, triple_batch_size=16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ref = copy_state(state)

    tl = trainer.train_list
    history = build_history(tl[:3], tiny_data.num_nodes, tiny_data.num_rels,
                            edge_bucket=tc.edge_bucket, rc_bucket=tc.rc_bucket)
    triples, mask = pad_triples(tl[3], tiny_data.num_rels, tc.triple_bucket)
    cmax = jnp.asarray(trainer._curvature_max(0), jnp.float32)
    tb = 16

    # hand-rolled reference: grad per chunk with the same PRNG split chain
    def total_loss(p, ms, tr, mk, rng):
        _, losses, new_ms, _ = hmodel.get_loss(
            p, ms, cfg, history, tr, mk, rng=rng, train=True,
            curvature_max=cmax)
        total = (tc.task_weight * losses["entity"]
                 + (1.0 - tc.task_weight) * losses["relation"]
                 + losses["static"] + losses["radius"])
        return total, new_ms

    rng = ref.rng
    ms = ref.model_state
    acc_manual = jax.tree.map(jnp.zeros_like, ref.params)
    for s in range(0, len(triples), tb):
        tr = jnp.asarray(triples[s:s + tb])
        mk = jnp.asarray(mask[s:s + tb])
        if float(mk.sum()) == 0:
            continue
        rng, step_rng = jax.random.split(rng)
        grads, ms = jax.grad(total_loss, has_aux=True)(
            ref.params, ms, tr, mk, step_rng)
        acc_manual = jax.tree.map(jnp.add, acc_manual, grads)
    updates, _ = trainer.opt.update(acc_manual, ref.opt_state, ref.params)
    import optax as _optax

    expected = _optax.apply_updates(ref.params, updates)

    # trainer path (donates state/acc, so run it on the original state)
    acc = trainer.zero_grads(state.params)
    for s in range(0, len(triples), tb):
        tr = jnp.asarray(triples[s:s + tb])
        mk = jnp.asarray(mask[s:s + tb])
        if float(mk.sum()) == 0:
            continue
        state, acc, _ = trainer.accum_grad_step(
            state, acc, history, tr, mk, cmax, None, None)
    acc_host = jax.device_get(acc)  # apply_accumulated donates acc
    state = trainer.apply_accumulated(state, acc)

    # summed grads match tightly; params after Adam's first step get a
    # looser bound (the m/sqrt(v) normalisation amplifies fp32
    # reduction-order noise for near-zero grads)
    for e, g in zip(jax.tree_util.tree_leaves(acc_manual),
                    jax.tree_util.tree_leaves(acc_host)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(g),
                                   rtol=1e-4, atol=1e-5)
    for e, g in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(g),
                                   rtol=2e-2, atol=1e-4)
    assert int(state.step) == 1  # ONE optimizer step for the whole snapshot


def test_triple_batch_modes_step_counts(tiny_data):
    """accumulate mode steps once per snapshot; per_chunk steps once per
    chunk — both run end-to-end with finite losses."""
    cfg = _cfg(tiny_data, decoder="hyperbolic_convtranse")
    tc = _tc()
    n_snaps = len(split_by_time(tiny_data.train)) - 1
    steps = {}
    for mode in ("accumulate", "per_chunk"):
        trainer = HyperbolicTrainer(cfg, tc, tiny_data, triple_batch_size=16,
                                    triple_batch_mode=mode)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, losses = trainer.run_epoch(state, 0)
        assert np.isfinite(losses["entity"])
        steps[mode] = int(state.step)
    assert steps["accumulate"] == n_snaps
    assert steps["per_chunk"] > n_snaps


@pytest.mark.parametrize("variant", ["learned_curvature", "est"])
def test_bf16_trains_for_learned_curvature_and_est(tiny_data, variant):
    """Round-5 regression: a STRONG-f32 learned curvature promoted the
    bf16 evolution carry through _static_radius/apply_radius (scan carry
    dtype mismatch), and the fp32 H-PES slow buffer did the same through
    inject_slow_state. Both configs must train in bf16."""
    kw = (dict(decoder="atth", learn_curvature=True, use_rel_curvature=True,
               use_entity_bias=True)
          if variant == "learned_curvature"
          else dict(use_est=True, use_time_aware_negative=True))
    cfg = _cfg(tiny_data, compute_dtype="bfloat16", **kw)
    trainer = HyperbolicTrainer(cfg, _tc(), tiny_data)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, losses = trainer.run_epoch(state, 0)
    assert np.isfinite(losses["entity"])
    assert np.asarray(state.params["dynamic_emb"]).dtype == np.float32
