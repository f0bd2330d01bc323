"""Stub for rdflib, imported at module scope by ref:rgcn/knowledge_graph.py.

Only the legacy RDF entity loaders touch it (never on the TKG path); any
attribute access raises so accidental use is loud."""


def __getattr__(name):
    raise RuntimeError(
        f"rdflib stub: attribute {name!r} requested — the legacy RDF "
        "loader path is not supported by the reference-run harness")
