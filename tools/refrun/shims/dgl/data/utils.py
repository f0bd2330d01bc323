"""Stubs for dgl.data.utils imported at module scope by
ref:rgcn/knowledge_graph.py (only the local-files code path actually runs)."""


def get_download_dir():
    return "/tmp/dgl-download-stub"


def download(url, path=None, **kw):
    raise RuntimeError("network disabled in the reference-run harness")


def extract_archive(file, target_dir, **kw):
    raise RuntimeError("archives unavailable in the reference-run harness")


def _get_dgl_url(path):
    return "stub://" + path
