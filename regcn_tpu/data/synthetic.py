"""Deterministic synthetic temporal-KG generator.

The reference's dataset archive (``data-release.tar.gz``) is absent from
its repository mount (see BASELINE.md), so this module provides seeded,
shape-compatible synthetic datasets in the same quad format the loaders
consume. The generator injects real temporal structure — a pool of
recurring (s, r, o) "base facts" that reappear with entity- and
relation-dependent periodicity plus uniform noise — so that models which
exploit history (the whole point of RE-GCN) score materially better than
chance and regression tests on MRR are meaningful.

Presets:
- ``synthetic-small``: 500 entities, 20 relations, 80 snapshots — CI-sized.
- ``synthetic-icews14s``: 7128 entities, 230 relations, 365 snapshots with
  a 304/30/31 train/valid/test split, ~250 triples per snapshot — the
  shape of ICEWS14s as printed in ref:hyperbolic_src/train.log.
"""

from __future__ import annotations

import numpy as np

from regcn_tpu.data.dataset import TKGData

_PRESETS = {
    "synthetic-small": dict(num_ents=500, num_rels=20, num_snaps=80,
                            triples_per_snap=300, split=(60, 10, 10)),
    "synthetic-medium": dict(num_ents=2000, num_rels=60, num_snaps=160,
                             triples_per_snap=400, split=(128, 16, 16)),
    "synthetic-icews14s": dict(num_ents=7128, num_rels=230, num_snaps=365,
                               triples_per_snap=250, split=(304, 30, 31)),
    "synthetic-icews18": dict(num_ents=23033, num_rels=256, num_snaps=304,
                              triples_per_snap=1200, split=(240, 30, 34)),
    "synthetic-wiki": dict(num_ents=12554, num_rels=24, num_snaps=232,
                           triples_per_snap=1500, split=(186, 23, 23)),
    "synthetic-yago": dict(num_ents=10623, num_rels=10, num_snaps=189,
                           triples_per_snap=1300, split=(151, 19, 19)),
    "synthetic-gdelt": dict(num_ents=7691, num_rels=240, num_snaps=2751,
                            triples_per_snap=700, split=(2303, 288, 160)),
    "synthetic-icews05-15": dict(num_ents=10488, num_rels=251, num_snaps=4017,
                                 triples_per_snap=115, split=(3243, 404, 370)),
}


def generate(name: str = "synthetic-small", seed: int = 123,
             with_static: bool = False, **overrides) -> TKGData:
    if name not in _PRESETS:
        raise KeyError(
            f"unknown synthetic dataset {name!r}; known: {sorted(_PRESETS)}")
    cfg = dict(_PRESETS[name])
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    num_ents = cfg["num_ents"]
    num_rels = cfg["num_rels"]
    num_snaps = cfg["num_snaps"]
    per_snap = cfg["triples_per_snap"]
    n_train, n_valid, n_test = cfg["split"]
    assert n_train + n_valid + n_test == num_snaps

    rng = np.random.default_rng(seed)

    # Base-fact pool with power-law entity popularity (realistic degree skew).
    pool_size = per_snap * 6
    ent_pop = rng.zipf(1.4, size=num_ents * 4) % num_ents
    s_pool = ent_pop[rng.integers(0, len(ent_pop), pool_size)]
    o_pool = ent_pop[rng.integers(0, len(ent_pop), pool_size)]
    r_pool = rng.integers(0, num_rels, pool_size)
    # avoid degenerate self-loops in the pool
    same = s_pool == o_pool
    o_pool[same] = (o_pool[same] + 1) % num_ents

    # Each base fact recurs with a period in [1, 16] and a phase.
    period = rng.integers(1, 17, pool_size)
    phase = rng.integers(0, 17, pool_size)
    # Fact lifetime: facts are only active inside a window of snapshots.
    start = rng.integers(0, max(num_snaps - 8, 1), pool_size)
    length = rng.integers(num_snaps // 4, num_snaps + 1, pool_size)

    quads = []
    for t in range(num_snaps):
        active = (t >= start) & (t < start + length) & ((t - phase) % period == 0)
        idx = np.flatnonzero(active)
        if len(idx) > per_snap:
            idx = rng.choice(idx, per_snap, replace=False)
        n_noise = max(per_snap // 10, per_snap - len(idx))
        noise_s = rng.integers(0, num_ents, n_noise)
        noise_o = rng.integers(0, num_ents, n_noise)
        noise_r = rng.integers(0, num_rels, n_noise)
        s = np.concatenate([s_pool[idx], noise_s])
        r = np.concatenate([r_pool[idx], noise_r])
        o = np.concatenate([o_pool[idx], noise_o])
        snap = np.stack([s, r, o, np.full_like(s, t)], axis=1)
        snap = np.unique(snap, axis=0)
        # keep time-sorted order; shuffle within snapshot for realism
        rng.shuffle(snap)
        snap[:, 3] = t
        quads.append(snap)

    all_quads = [np.asarray(q, dtype=np.int64) for q in quads]
    train = np.concatenate(all_quads[:n_train], axis=0)
    valid = np.concatenate(all_quads[n_train : n_train + n_valid], axis=0)
    test = np.concatenate(all_quads[n_train + n_valid :], axis=0)

    static_triples = None
    num_static_rels = 0
    num_words = 0
    if with_static:
        # entity-word static graph (ref e-w-graph.txt consumed at
        # ref:src/main.py:145-151): entities from the same popularity
        # cluster share words, so the angular constraint carries signal
        num_words = max(num_ents // 2, 16)
        num_static_rels = 8
        srng = np.random.default_rng(seed + 7)
        links = []
        cluster = srng.integers(0, max(num_words // 4, 1), num_ents)
        for k in range(3):
            w = (cluster * 4 + srng.integers(0, 4, num_ents)) % num_words
            r = srng.integers(0, num_static_rels, num_ents)
            links.append(np.stack([np.arange(num_ents), r, w], axis=1))
        raw = np.unique(np.concatenate(links), axis=0).astype(np.int64)
        # compact word ids to a contiguous 0..num_words-1 range: the
        # reference sizes its static node table by len(unique(words))
        # (ref:src/main.py:147-149), so gaps would make word ids exceed
        # the table; then offset past entity ids, matching what
        # load_from_local produces from e-w-graph.txt
        used, dense = np.unique(raw[:, 2], return_inverse=True)
        num_words = len(used)
        static_triples = np.stack(
            [raw[:, 0], raw[:, 1], dense + num_ents], axis=1)

    return TKGData(
        train=train,
        valid=valid,
        test=test,
        num_nodes=num_ents,
        num_rels=num_rels,
        static_triples=static_triples,
        num_static_rels=num_static_rels,
        num_words=num_words,
    )
