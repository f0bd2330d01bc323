"""Native (C++) host-runtime components.

``_graph_builder`` is compiled from ``native/graph_builder.cc`` (run
``make -C native``, or :func:`ensure_built` compiles it on demand with
g++). The data layer uses it automatically when present; everything
falls back to the pure-numpy implementation otherwise.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys

log = logging.getLogger(__name__)

_native = None
_tried = False


class StaleNativeError(RuntimeError):
    """A stale _graph_builder.so was demoted; numpy fallback is safe."""


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_built(quiet: bool = True) -> bool:
    """Compile the extension in-tree if g++ is available. Returns success."""
    global _tried
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_repo_root(), "native")],
            check=True, capture_output=quiet,
        )
        _tried = False  # allow re-import attempt
        return load() is not None
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        log.debug("native build failed: %s", exc)
        return False


def load():
    """Import the compiled module if present; None otherwise."""
    global _native, _tried
    if _native is not None or _tried:
        return _native
    _tried = True
    try:
        from regcn_tpu.native import _graph_builder  # type: ignore

        _native = _graph_builder
    except ImportError:
        _native = None
    return _native


def build_snapshot_arrays(triples, num_nodes, num_rels, edge_pad, rc_pad,
                          rc_src_only=0):
    """Native fast path; raises RuntimeError if the extension is absent."""
    global _native
    mod = load()
    if mod is None:
        raise RuntimeError(
            "native graph builder not built; run `make -C native` or use the "
            "numpy path"
        )
    try:
        return mod.build_snapshot_arrays(triples, num_nodes, num_rels,
                                         edge_pad, rc_pad, rc_src_only)
    except TypeError as exc:
        # a stale _graph_builder.so predating the rc_src_only arg rejects
        # the 6-arg call with an arity complaint; demote to the numpy path
        # loudly instead of failing every build_snapshot() with an opaque
        # TypeError. Any OTHER TypeError (e.g. wrong-typed caller input)
        # is a real bug and must propagate.
        msg = str(exc)
        # only arity-style complaints indicate a stale signature; value/
        # type complaints ("argument 1 must be numpy.ndarray", "integer
        # argument expected") are real caller bugs and must propagate
        if not any(s in msg for s in ("takes exactly", "takes at least",
                                      "takes at most")):
            raise
        log.warning(
            "stale native/_graph_builder.so (old signature) — rebuild with "
            "`make -C native`; falling back to the numpy snapshot builder")
        _native = None
        raise StaleNativeError(
            "stale native graph builder; rebuild required") from exc
