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
