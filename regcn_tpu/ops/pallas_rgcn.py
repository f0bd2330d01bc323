"""Pallas TPU kernel: RGCN edge-message scatter-add.

The aggregation ``out[v] = sum_{e: dst_e = v} msg_e`` is the sparse half
of the UnionRGCN layer (SURVEY.md §3.4). XLA lowers ``segment_sum`` to a
serialized scatter on TPU; this kernel instead rides the MXU: edges are
destination-sorted, streamed in tiles, and each tile's contribution is a
one-hot [CHUNK, TE] x [TE, d] matmul accumulated into the VMEM-resident
output. Because the edges are sorted, each tile only intersects a couple
of row chunks — a ``pl.when`` guard skips the rest, so total MXU work is
O(E * CHUNK * d) rather than O(E * N * d).

Scope: N * d must fit VMEM (≈ N ≤ 15k at d=200 f32); the public wrapper
falls back to the XLA path otherwise. Backward = gather (custom VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _scatter_kernel(dst_ref, msg_ref, out_ref, *, n_rows, chunk, te):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dstv = dst_ref[:, 0]  # [TE]; padded entries carry n_rows (never match)
    first = jnp.min(dstv)
    last = jnp.max(jnp.where(dstv >= n_rows, -1, dstv))

    msg = msg_ref[:]  # [TE, d]
    # the MXU truncates fp32 dot inputs to bf16; the one-hot factor is
    # exact in bf16, so splitting msg into bf16 hi/lo halves keeps the
    # scatter fp32-exact (two matmuls instead of a 6-pass HIGHEST dot)
    msg_hi = msg.astype(jnp.bfloat16).astype(jnp.float32)
    msg_lo = msg - msg_hi
    for k in range(n_rows // chunk):
        row0 = k * chunk

        @pl.when((last >= row0) & (first < row0 + chunk))
        def _(k=k, row0=row0):
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, te), 0) + row0
            onehot = (row_ids == dstv[None, :]).astype(jnp.float32)
            out_ref[row0:row0 + chunk, :] += (
                jnp.dot(onehot, msg_hi, preferred_element_type=jnp.float32)
                + jnp.dot(onehot, msg_lo, preferred_element_type=jnp.float32)
            )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def scatter_add_sorted(msg, dst, num_segments, tile_edges=512, chunk=512):
    """out[v] = sum of msg rows with dst == v; dst must be sorted ascending
    with padded entries set to num_segments."""
    return _scatter_fwd_impl(msg, dst, num_segments, tile_edges, chunk)


def _scatter_fwd_impl(msg, dst, num_segments, tile_edges, chunk):
    E, d = msg.shape
    n_pad = _round_up(num_segments, chunk)
    e_pad = _round_up(E, tile_edges)
    msg_p = jnp.pad(msg, ((0, e_pad - E), (0, 0)))
    dst_p = jnp.pad(dst, (0, e_pad - E), constant_values=n_pad)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n_rows=n_pad, chunk=chunk, te=tile_edges),
        grid=(e_pad // tile_edges,),
        in_specs=[
            pl.BlockSpec((tile_edges, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_edges, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
    )(dst_p.reshape(-1, 1).astype(jnp.int32), msg_p.astype(jnp.float32))
    return out[:num_segments]


def _scatter_fwd(msg, dst, num_segments, tile_edges, chunk):
    return _scatter_fwd_impl(msg, dst, num_segments, tile_edges, chunk), dst


def _scatter_bwd(num_segments, tile_edges, chunk, dst, g):
    # d(msg) = g[dst]; padded dst rows (== num_segments) read garbage ->
    # clamp then zero via mask
    safe = jnp.minimum(dst, num_segments - 1)
    gm = g[safe] * (dst < num_segments)[:, None]
    return (gm, None)


scatter_add_sorted.defvjp(_scatter_fwd, _scatter_bwd)


def rgcn_aggregate_pallas(h, rel_emb, weight, src, dst, rel, edge_mask, in_deg_norm):
    """Pallas-backed UnionRGCN aggregation (drop-in for the XLA path).

    Sorts edges by destination on device (cheap vs the GEMMs), computes
    the edge GEMM with XLA (already MXU-optimal), and runs the scatter on
    the Pallas kernel. Falls back to XLA when N*d exceeds the VMEM budget.
    """
    n, d = h.shape
    if n * d * 4 > 8 * 1024 * 1024:  # VMEM budget for the output block
        from regcn_tpu.ops.rgcn_scatter import _rgcn_aggregate_xla

        return _rgcn_aggregate_xla(h, rel_emb, weight, src, dst, rel, edge_mask, in_deg_norm)

    # destination sort; masked edges pushed to the end with dst = n
    dst_key = jnp.where(edge_mask > 0, dst, n)
    order = jnp.argsort(dst_key)
    src_s = src[order]
    rel_s = rel[order]
    dst_s = dst_key[order]
    mask_s = edge_mask[order]

    msg = (h[src_s] + rel_emb[rel_s]).astype(weight.dtype)
    msg = jnp.dot(msg, weight, preferred_element_type=jnp.float32)
    msg = msg * mask_s[:, None]
    agg = scatter_add_sorted(msg, dst_s, n)
    # fp32 scatter accumulation; return in the compute dtype so bf16
    # mode keeps a bf16 scan carry (matches the XLA path)
    return (agg * in_deg_norm[:, None].astype(agg.dtype)).astype(h.dtype)
