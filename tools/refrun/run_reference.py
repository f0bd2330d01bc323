"""Run the ACTUAL reference code (/root/reference) on CPU torch.

Closes VERDICT.md round-1 item #1: with the reference's data tarball
absent and no network, the only way to compare quality end-to-end is to
run the reference's own training code on the synthetic twin exported by
tools/refrun/export_dataset.py — identical files, both stacks.

How it works:
- a minimal DGL shim (tools/refrun/shims/dgl) supplies the graph /
  update_all surface the reference uses; rdflib is stubbed;
- ``torch.Tensor.cuda`` is monkeypatched to a no-op, neutralising the
  reference's three hard-coded ``.cuda()`` sites
  (ref:rgcn/layers.py:229-231 etc.) WITHOUT modifying /root/reference;
- cwd is moved to ``<workspace>/run`` so the reference's relative
  ``../data/<ds>`` and ``../models/`` paths land inside the workspace.

Usage:
    python tools/refrun/run_reference.py --workspace /tmp/refrun_ws \
        --entry baseline -- -d SMALL --n-epochs 30 --evaluate-every 1 \
        --entity-prediction --relation-prediction --layer-norm \
        --train-history-len 3 --test-history-len 3 --gpu -1
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("REFERENCE_ROOT", "/root/reference")

ENTRIES = {
    "baseline": os.path.join(REF, "src", "main.py"),
    "hyperbolic": os.path.join(REF, "hyperbolic_src", "hyperbolic_main.py"),
    "hisres": os.path.join(REF, "hisres_src", "hisres_main.py"),
    "hisres_history": os.path.join(REF, "hisres_src", "get_new_history.py"),
}


def _prepare_hisres():
    """Make the reference's hisres stack importable as committed.

    The checked-in ``hisres_src/model.py`` is STALE: its ``BaseRGCN``
    takes 9 args while ``hisres_src/hisres.py:202-246`` constructs
    ``RGCNCell``/``CandRGCN`` with the 15-arg signature of
    ``ref:src/model.py:4-71``. Inject the intended BaseRGCN via
    ``sys.modules`` (no modification of /root/reference), and stub the
    ``setproctitle`` dependency absent from this image.
    """
    import importlib.util
    import types

    if "setproctitle" not in sys.modules:
        stub = types.ModuleType("setproctitle")
        stub.setproctitle = lambda *a, **kw: None
        sys.modules["setproctitle"] = stub

    spec = importlib.util.spec_from_file_location(
        "hisres_src.model", os.path.join(REF, "src", "model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import hisres_src  # executes the (empty) package __init__

    sys.modules["hisres_src.model"] = mod
    hisres_src.model = mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--entry", choices=sorted(ENTRIES), default="baseline")
    p.add_argument("--workspace", required=True,
                   help="dir containing data/<ds>/ (see export_dataset.py)")
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="arguments passed to the reference entry script "
                        "(prefix with --)")
    args = p.parse_args()
    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest

    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(0, REF)

    import numpy as np
    import torch

    # neutralise hard-coded .cuda() sites; keep is_available() == False so
    # the reference's own use_cuda logic stays on the CPU path
    # real .cuda() returns a NEW (non-leaf) tensor; the reference depends
    # on that for `loss = zeros(1, requires_grad=True).cuda(); loss += ...`
    # (in-place on a leaf raises) — clone() reproduces the graph semantics
    def _cuda(self, *a, **kw):
        return self.clone() if (self.requires_grad and self.is_leaf) else self

    torch.Tensor.cuda = _cuda
    torch.nn.Module.cuda = lambda self, *a, **kw: self
    assert not torch.cuda.is_available()

    # the reference calls tensor.to(self.gpu) with gpu=-1 on CPU runs
    # (ref:src/rrgcn.py:212); treat a negative device index as a no-op
    _orig_to = torch.Tensor.to

    def _to(self, *a, **kw):
        if a and isinstance(a[0], int) and a[0] < 0:
            return self
        return _orig_to(self, *a, **kw)

    torch.Tensor.to = _to

    # the reference's CPU branch does `loss = torch.zeros(1,
    # requires_grad=True); loss += ...` (ref:src/rrgcn.py:205-219) — an
    # in-place op on a grad leaf, which torch forbids (the CUDA branch
    # survives only because .cuda() makes a non-leaf copy). Return a
    # non-leaf accumulator so the reference's CPU path runs as intended.
    _orig_zeros = torch.zeros

    def _zeros(*a, **kw):
        if kw.get("requires_grad"):
            kw = dict(kw, requires_grad=False)
            return _orig_zeros(*a, **kw).requires_grad_(True).clone()
        return _orig_zeros(*a, **kw)

    torch.zeros = _zeros

    # the reference baseline is unseeded (SURVEY.md §4); seed here for a
    # reproducible comparison without touching /root/reference
    import random

    random.seed(args.seed)
    np.random.seed(args.seed)
    torch.manual_seed(args.seed)

    run_dir = os.path.join(args.workspace, "run")
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(os.path.join(args.workspace, "models"), exist_ok=True)
    os.chdir(run_dir)

    entry = ENTRIES[args.entry]
    if args.entry.startswith("hisres"):
        _prepare_hisres()
    if args.entry == "hisres":
        _run_hisres_main(entry, rest)
        return
    sys.argv = [entry] + rest
    print(f"[refrun] entry={entry}")
    print(f"[refrun] argv={rest}")
    print(f"[refrun] cwd={os.getcwd()} (data=../data, models=../models)")
    runpy.run_path(entry, run_name="__main__")


def _run_hisres_main(entry: str, rest: list) -> None:
    """Drive ref:hisres_src/hisres_main.py around its two committed bugs.

    1. Everything (argparse + run_experiment call) sits under
       ``if __name__ == '__main__'``, and runpy tears the namespace down
       on return — import it as a module instead and call
       ``run_experiment`` ourselves, building ``args`` by exec'ing the
       reference's OWN argparse block (extracted verbatim at runtime, so
       every default stays the reference's).
    2. The validation call (ref:hisres_main.py:375-388) passes
       ``valid_times`` where ``test()``'s indexing
       (``timestamps_total[history_len+time_idx-1]``, :91) needs the
       FULL timestamp sequence — an unconditional IndexError for any
       dataset with more train than valid snapshots, i.e. validation is
       unrunnable as committed. Wrap ``test`` to substitute the full
       prefix ``all_times[:len(history_list)]`` (exactly what the final
       test call passes); no other behavior changes.
    """
    import importlib.util
    import re

    import numpy as np

    spec = importlib.util.spec_from_file_location("hisres_main_refrun", entry)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["hisres_main_refrun"] = mod
    spec.loader.exec_module(mod)  # __name__ != "__main__": defs only

    # run_experiment hard-codes seed_torch(2023) (ref:hisres_main.py:150);
    # REFRUN_HISRES_SEED overrides it so the reference's own seed variance
    # can be sampled (the only mutation is the seed value)
    seed_override = os.environ.get("REFRUN_HISRES_SEED")
    if seed_override is not None:
        orig_seed_torch = mod.seed_torch
        mod.seed_torch = lambda _s, s=int(seed_override): orig_seed_torch(s)
        print(f"[refrun:hisres] seed_torch overridden to {seed_override}")

    # build args with the reference's own parser block
    src = open(entry).read()
    m = re.search(r"(    parser = argparse\.ArgumentParser.*?)"
                  r"\n    args = parser\.parse_args\(\)", src, re.S)
    assert m, "could not locate the argparse block in hisres_main.py"
    import argparse as _argparse
    import textwrap

    ns = {"argparse": _argparse}
    exec(textwrap.dedent(m.group(1)), ns)
    hisres_args = ns["parser"].parse_args(rest)
    print(f"[refrun:hisres] args={hisres_args}")
    mod.args = hisres_args

    # full timestamp sequence from the exported files (train+valid+test)
    data_dir = os.path.join("..", "data", hisres_args.dataset)
    times = []
    for split in ("train", "valid", "test"):
        quads = np.loadtxt(os.path.join(data_dir, f"{split}.txt"),
                           dtype=np.int64).reshape(-1, 4)
        times.extend(np.unique(quads[:, 3]).tolist())
    all_times = np.asarray(sorted(set(times)))

    orig_test = mod.test

    def test_fixed(model, history_list, test_list, *rest_a, **kw):
        rest_a = list(rest_a)
        # positional layout after test_list: num_rels, num_nodes,
        # use_cuda, all_ans, all_ans_r, model_name, static_graph,
        # timestamps_total, history_time_nogt [, mode]
        rest_a[7] = all_times[: len(history_list)]
        return orig_test(model, history_list, test_list, *rest_a, **kw)

    mod.test = test_fixed
    mod.run_experiment(hisres_args)


if __name__ == "__main__":
    main()
