"""CLI driver smoke test (ref:src/main.py parity surface)."""

import json
import sys

import numpy as np
import pytest

from regcn_tpu import cli


def test_cli_train_and_test(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    argv = [
        "train", "-d", "synthetic-small", "--n-epochs", "1", "--n-hidden", "16",
        "--train-history-len", "2", "--test-history-len", "2",
        "--models-dir", str(tmp_path / "models"),
    ]
    # shrink the generator via DataConfig defaults: use the small preset as-is
    result = cli.main(argv)
    assert 0 < result["ent_raw"]["mrr"] <= 1
    assert "hits@10" in result["ent_filter"]


def test_cli_rejects_unknown_tune_param():
    with pytest.raises(SystemExit):
        cli.run_grid(cli.build_parser().parse_args(
            ["train", "-d", "synthetic-small", "--tune", "bogus_param"]))


def test_cli_hyperbolic_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    result = cli.main([
        "hyperbolic", "-d", "synthetic-small", "--n-epochs", "1",
        "--n-hidden", "16", "--n-bases", "4", "--train-history-len", "2",
        "--test-history-len", "2", "--decoder", "roth", "--patience", "2",
        "--models-dir", str(tmp_path / "models"),
    ])
    assert 0 < result["ent_raw"]["mrr"] <= 1


def test_grid_family_hisres(tmp_path, monkeypatch):
    """grid --grid-family hisres sweeps the hisres runner with the
    hisres-specific history_rate knob (the reference's per-dataset
    hp_range_* tables are missing from its repo, ref:hisres_main.py:551-562)."""
    import regcn_tpu.cli as cli

    monkeypatch.chdir(tmp_path)
    calls = []

    def fake_hisres(args):
        calls.append((args.history_rate, args.n_hidden))
        return {"ent_raw": {"mrr": 0.1 * len(calls)}}

    monkeypatch.setattr(cli, "run_hisres", fake_hisres)
    monkeypatch.setitem(cli.HP_RANGE_HISRES, "history_rate", [0.1, 0.5])
    results = cli.main(["grid", "-d", "synthetic-small",
                        "--grid-family", "hisres", "--tune", "history_rate"])
    assert [c[0] for c in calls] == [0.1, 0.5]
    assert len(results) == 2


def test_grid_table_dataset_overrides():
    from regcn_tpu.cli import grid_table

    t = grid_table("synthetic-wiki", "regcn")
    assert t["train_history_len"] == [1, 2, 3]
    t2 = grid_table("synthetic-small", "hisres")
    assert "history_rate" in t2


def test_grid_vectorized_hyperbolic(tmp_path, monkeypatch):
    """grid --grid-family hyperbolic --vectorize routes through the
    HyperbolicSweepRunner (K models in one vmapped program)."""
    import regcn_tpu.cli as cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setitem(cli.HP_RANGE, "lr", [1e-3, 5e-4])
    results = cli.main([
        "grid", "-d", "synthetic-small", "--grid-family", "hyperbolic",
        "--vectorize", "--tune", "lr", "--n-epochs", "1", "--n-hidden", "16",
        "--n-layers", "1", "--train-history-len", "2",
        "--test-history-len", "2"])
    assert len(results) == 2
    assert all(0 <= r["valid_ent_mrr_raw"] <= 1 for r in results)


def test_grid_vectorized_hisres_rejected():
    import pytest

    import regcn_tpu.cli as cli

    with pytest.raises(SystemExit, match="vectorize"):
        cli.main(["grid", "-d", "synthetic-small", "--grid-family", "hisres",
                  "--vectorize", "--tune", "lr"])


# ------------------------------------------ eval-protocol flags (round 5)
class _FakeStats:
    mrr = 0.5
    hits = {1: 0.3, 3: 0.4, 10: 0.6}


def _fake_stats():
    return {k: _FakeStats() for k in ("ent_raw", "ent_filter",
                                      "rel_raw", "rel_filter")}


def test_cli_eval_protocol_flag_plumbing(tmp_path, monkeypatch):
    """--multi-step/--topk/--relation-evaluation/--run-analysis reach the
    trainer in ALL THREE modes (round-4 verdict item: these flags were
    silently dropped outside hisres)."""
    import regcn_tpu.cli as cli
    import regcn_tpu.hisres.train as hisres_train
    import regcn_tpu.hyperbolic.train as hyp_train
    import regcn_tpu.train.loop as loop

    captured = {}

    def make_fake(name):
        class FakeTrainer:
            def __init__(self, *a, **kw):
                captured[name, "run_analysis"] = kw.get("run_analysis")

            def fit(self, *a, **kw):
                captured[name, "selection_metric"] = kw.get("selection_metric")
                return object(), {"best_valid_mrr_raw": 0.5,
                                  "selection_metric": kw.get("selection_metric")}

            def test(self, state, **kw):
                captured[name, "test_kwargs"] = kw
                return _fake_stats()

        return FakeTrainer

    monkeypatch.setattr(loop, "Trainer", make_fake("train"))
    monkeypatch.setattr(hyp_train, "HyperbolicTrainer", make_fake("hyperbolic"))
    monkeypatch.setattr(hisres_train, "HisResTrainer", make_fake("hisres"))
    monkeypatch.chdir(tmp_path)

    flags = ["-d", "synthetic-small", "--multi-step", "--topk", "3",
             "--relation-evaluation", "--run-analysis",
             "--models-dir", str(tmp_path / "models")]
    cli.main(["train"] + flags)
    cli.main(["hyperbolic"] + flags)
    cli.main(["hisres"] + flags)

    for mode in ("train", "hyperbolic", "hisres"):
        assert captured[mode, "run_analysis"] is True, mode
        assert captured[mode, "selection_metric"] == "rel_raw", mode
        kw = captured[mode, "test_kwargs"]
        assert kw["multi_step"] is True and kw["topk"] == 3, mode
        assert kw["relation_evaluation"] is True, mode


def test_cli_rejects_eval_flags_in_bench_and_entity_modes():
    import regcn_tpu.cli as cli

    for mode in ("bench", "entity"):
        for flag in ("--multi-step", "--relation-evaluation", "--run-analysis"):
            with pytest.raises(SystemExit, match="applies to"):
                cli.main([mode, "-d", "synthetic-small", flag])


def test_cli_hyperbolic_multistep_relation_eval(tmp_path, monkeypatch):
    """End-to-end: the hyperbolic CLI honors --multi-step
    --relation-evaluation (feeds predicted-RELATION snapshots back,
    ref:hyperbolic_main.py:135-142) and --run-analysis (per-epoch
    gradient/radius/curvature records)."""
    import regcn_tpu.cli as cli
    import regcn_tpu.train.loop as loop

    calls = {"snap_r": 0}
    orig = loop.construct_snap_r

    def spy(*a, **kw):
        calls["snap_r"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(loop, "construct_snap_r", spy)
    monkeypatch.chdir(tmp_path)
    result = cli.main([
        "hyperbolic", "-d", "synthetic-small", "--n-epochs", "1",
        "--n-hidden", "16", "--n-bases", "4", "--train-history-len", "2",
        "--test-history-len", "2", "--patience", "1",
        "--multi-step", "--topk", "3", "--relation-evaluation",
        "--run-analysis", "--models-dir", str(tmp_path / "models"),
    ])
    assert 0 < result["ent_raw"]["mrr"] <= 1
    assert calls["snap_r"] > 0  # relation feedback actually ran


def test_cli_vectorized_grid_rejects_eval_flags():
    """grid --vectorize has no test/analysis phase; eval-protocol flags
    must error instead of silently no-opping (round-5 review finding)."""
    import regcn_tpu.cli as cli

    for flag in ("--multi-step", "--relation-evaluation", "--run-analysis"):
        with pytest.raises(SystemExit, match="vectorize"):
            cli.main(["grid", "-d", "synthetic-small", "--grid-family",
                      "hyperbolic", "--vectorize", "--tune", "lr", flag])
