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
