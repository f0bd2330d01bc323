"""Native C++ graph builder: bit-parity with the numpy path + speed."""

import time

import numpy as np
import pytest

from regcn_tpu import native
from regcn_tpu.data.snapshots import build_snapshot

needs_native = pytest.mark.skipif(
    native.load() is None and not native.ensure_built(),
    reason="native extension not built and no compiler available",
)


@needs_native
def test_native_matches_numpy(rng, tiny_graph):
    n, r, triples = tiny_graph
    a = build_snapshot(triples, n, r, edge_bucket=64, use_native=False)
    b = build_snapshot(triples, n, r, edge_bucket=64, use_native=True)
    for f in ("src", "dst", "rel", "edge_mask", "in_deg_norm", "has_in_edge",
              "rc_rel", "rc_ent", "rc_mask"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    assert a.num_edges == b.num_edges and a.num_triples == b.num_triples


@needs_native
def test_native_is_faster_on_large_snapshot(rng):
    n_ents, n_rels, m = 20000, 200, 50000
    triples = np.stack([rng.integers(0, n_ents, m), rng.integers(0, n_rels, m),
                        rng.integers(0, n_ents, m)], 1)
    t0 = time.perf_counter()
    for _ in range(3):
        build_snapshot(triples, n_ents, n_rels, use_native=False)
    t_numpy = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        build_snapshot(triples, n_ents, n_rels, use_native=True)
    t_native = time.perf_counter() - t0
    # informational bound: native should not be slower than numpy
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
