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


def test_stale_native_signature_falls_back_to_numpy(rng, tiny_graph,
                                                    monkeypatch):
    """A stale _graph_builder.so (old 5-arg PyArg format) must demote to
    the numpy builder with a rebuild hint, not fail every
    build_snapshot() with an opaque TypeError — and use_native=True must
    still raise loudly."""
    class _Stale:
        @staticmethod
        def build_snapshot_arrays(*args):
            raise TypeError("function takes exactly 5 arguments (6 given)")

    monkeypatch.setattr(native, "_native", _Stale())
    monkeypatch.setattr(native, "_tried", True)
    n, r, triples = tiny_graph
    snap = build_snapshot(triples, n, r, edge_bucket=64)  # numpy fallback
    ref = build_snapshot(triples, n, r, edge_bucket=64, use_native=False)
    np.testing.assert_array_equal(snap.src, ref.src)
    assert snap.num_edges == ref.num_edges
    with pytest.raises(RuntimeError, match="stale"):
        # the fallback above reset the cached module; re-prime the stale one
        monkeypatch.setattr(native, "_native", _Stale())
        build_snapshot(triples, n, r, edge_bucket=64, use_native=True)


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
