"""Export a regcn_tpu synthetic twin dataset to the reference's TSV layout.

Writes ``<workspace>/data/<out_name>/{entity2id,relation2id,train,valid,
test}.txt`` in the format ref:rgcn/knowledge_graph.py:526-555 parses
(``name\tid`` dictionaries; ``s\tr\to\tt`` integer quads), so the ACTUAL
reference code (via tools/refrun/run_reference.py) and regcn_tpu (via
``load_data(out_name, data_dir=<workspace>/data)``) train on byte-identical
files. ``out_name`` must be in the reference's dataset whitelist
(ref:rgcn/utils.py:361-363), e.g. ICEWS14s or SMALL.

Usage:
    python tools/refrun/export_dataset.py --name synthetic-small \
        --out-name SMALL --workspace /tmp/refrun_ws [--seed 123]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export(name: str, out_name: str, workspace: str, seed: int = 123,
           with_static: bool = False) -> str:
    from regcn_tpu.data.synthetic import generate

    data = generate(name, seed=seed, with_static=with_static)
    d = os.path.join(workspace, "data", out_name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "entity2id.txt"), "w") as f:
        for i in range(data.num_nodes):
            f.write(f"entity_{i}\t{i}\n")
    with open(os.path.join(d, "relation2id.txt"), "w") as f:
        for i in range(data.num_rels):
            f.write(f"relation_{i}\t{i}\n")
    for split in ("train", "valid", "test"):
        quads = getattr(data, split)
        np.savetxt(os.path.join(d, f"{split}.txt"), quads, fmt="%d", delimiter="\t")
    # stat.txt: "<num_entities>\t<num_relations>" — consumed by the hisres
    # history precompute (ref:hisres_src/get_new_history.py:76-79)
    with open(os.path.join(d, "stat.txt"), "w") as f:
        f.write(f"{data.num_nodes}\t{data.num_rels}\n")
    if with_static:
        # e-w-graph.txt with RAW word ids: ref:src/main.py:145-149 and
        # regcn_tpu.data.dataset.load_from_local both add num_nodes
        # themselves; the synthetic generator stores them offset
        st = data.static_triples.copy()
        st[:, 2] -= data.num_nodes
        np.savetxt(os.path.join(d, "e-w-graph.txt"), st, fmt="%d",
                   delimiter="\t")
        print(f"  + e-w-graph.txt: {len(st)} links, "
              f"{data.num_words} words, {data.num_static_rels} static rels")
    print(f"exported {name} -> {d}: {data.num_nodes} entities, "
          f"{data.num_rels} relations, "
          f"{len(data.train)}/{len(data.valid)}/{len(data.test)} quads")
    return d


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="synthetic-small")
    p.add_argument("--out-name", default="SMALL")
    p.add_argument("--workspace", required=True)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--with-static", action="store_true", default=False,
                   help="also export e-w-graph.txt (static word graph)")
    a = p.parse_args()
    export(a.name, a.out_name, a.workspace, a.seed, with_static=a.with_static)
