"""Minimal CPU-only DGL shim — just enough surface to run the reference
codebase (/root/reference) unmodified on the torch CPU wheel baked into
this image, so regcn_tpu can be compared against the ACTUAL reference
implementation on identical data (VERDICT.md round-1 item #1).

Implements the API the reference actually touches:
  dgl.graph((src, dst), num_nodes=N) -> DGLGraph with
    .ndata / .edata frames, .number_of_nodes/_edges, .in_degrees,
    .apply_edges(udf), .update_all(udf_msg, fn.sum(...) | udf_reduce,
    apply_func), .to(device)
  dgl.function.sum(msg=..., out=...)
  dgl.data.utils.{download, extract_archive, get_download_dir, _get_dgl_url}

UDF reduce functions (FHNN/LGCN/HGAT per-node loops in the reference) are
supported via degree-bucketed mailboxes, matching DGL 0.5 semantics:
nodes are grouped by in-degree, the reduce udf sees nodes.mailbox[field]
of shape [Nk, k, ...] per bucket, zero-fill for isolated nodes.

This is a test/verification harness, NOT a DGL replacement.
"""

from __future__ import annotations

import torch

from . import data, function  # noqa: F401


class _Frame(dict):
    """ndata/edata store. dict already provides update/pop/get."""


class _NodeView:
    """Per-edge view of node features (edges.src / edges.dst)."""

    def __init__(self, frame: _Frame, idx: torch.Tensor):
        self._frame = frame
        self._idx = idx

    def __getitem__(self, key):
        return self._frame[key][self._idx]


class EdgeBatch:
    def __init__(self, g: "DGLGraph"):
        self.src = _NodeView(g.ndata, g._src)
        self.dst = _NodeView(g.ndata, g._dst)
        self.data = _EdgeDataView(g.edata)


class _EdgeDataView:
    def __init__(self, frame: _Frame):
        self._frame = frame

    def __getitem__(self, key):
        return self._frame[key]


class NodeBatch:
    """Bucket of nodes handed to a udf reduce/apply function."""

    def __init__(self, data: dict, mailbox: dict | None = None):
        self.data = data
        self.mailbox = mailbox


class DGLGraph:
    def __init__(self, src, dst, num_nodes: int):
        self._src = torch.as_tensor(src, dtype=torch.long).reshape(-1)
        self._dst = torch.as_tensor(dst, dtype=torch.long).reshape(-1)
        if num_nodes is None:
            num_nodes = int(max(self._src.max(), self._dst.max())) + 1
        self._n = int(num_nodes)
        self.ndata = _Frame()
        self.edata = _Frame()

    # ----------------------------------------------------------- structure
    @property
    def device(self):  # hisres_rgcn/utils.py:597 torch.arange(device=g.device)
        return torch.device("cpu")

    def number_of_nodes(self) -> int:
        return self._n

    def num_nodes(self) -> int:
        return self._n

    def number_of_edges(self) -> int:
        return int(self._src.shape[0])

    def num_edges(self) -> int:
        return self.number_of_edges()

    def edges(self):
        return self._src, self._dst

    def in_degrees(self, v=None):
        deg = torch.zeros(self._n, dtype=torch.long)
        deg.scatter_add_(0, self._dst, torch.ones_like(self._dst))
        if v is None:
            return deg
        if isinstance(v, range):
            v = torch.arange(v.start, v.stop, v.step if v.step else 1)
        return deg[torch.as_tensor(v, dtype=torch.long)]

    def to(self, device):  # CPU-only shim
        return self

    # ------------------------------------------------------- message passing
    def apply_edges(self, func):
        self.edata.update(func(EdgeBatch(self)))

    def update_all(self, message_func, reduce_func, apply_node_func=None):
        msgs = message_func(EdgeBatch(self))
        if isinstance(reduce_func, function._BuiltinSum):
            msg = msgs[reduce_func.msg_field]
            out = torch.zeros((self._n,) + tuple(msg.shape[1:]), dtype=msg.dtype)
            out.index_add_(0, self._dst, msg)
            self.ndata[reduce_func.out_field] = out
        else:
            self._reduce_udf(msgs, reduce_func)
        if apply_node_func is not None:
            self.ndata.update(apply_node_func(NodeBatch(self.ndata)))

    def _reduce_udf(self, msgs: dict, reduce_func):
        """Degree-bucketed udf reduce (DGL 0.5 semantics)."""
        deg = self.in_degrees()
        order = torch.argsort(self._dst, stable=True)
        dst_sorted = self._dst[order]
        # per-destination contiguous spans in sorted edge order
        outputs: dict = {}
        for k in torch.unique(deg).tolist():
            if k == 0:
                continue
            nodes_k = torch.nonzero(deg == k, as_tuple=False).reshape(-1)
            # edge positions (in sorted order) whose dst has degree k
            sel = deg[dst_sorted] == k
            pos = torch.nonzero(sel, as_tuple=False).reshape(-1)
            # sorted by dst, so every consecutive k entries belong to one node
            mailbox = {
                key: val[order][pos].reshape((len(nodes_k), k) + tuple(val.shape[1:]))
                for key, val in msgs.items()
            }
            bucket_data = {key: val[nodes_k] for key, val in self.ndata.items()}
            out = reduce_func(NodeBatch(bucket_data, mailbox))
            for key, val in out.items():
                if key not in outputs:
                    outputs[key] = torch.zeros(
                        (self._n,) + tuple(val.shape[1:]), dtype=val.dtype)
                outputs[key][nodes_k] = val
        for key, val in outputs.items():
            self.ndata[key] = val


def graph(edges_tuple, num_nodes=None):
    src, dst = edges_tuple
    return DGLGraph(src, dst, num_nodes)
