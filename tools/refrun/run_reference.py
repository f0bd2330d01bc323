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
}


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
    sys.argv = [entry] + rest
    print(f"[refrun] entry={entry}")
    print(f"[refrun] argv={rest}")
    print(f"[refrun] cwd={os.getcwd()} (data=../data, models=../models)")
    runpy.run_path(entry, run_name="__main__")


if __name__ == "__main__":
    main()
