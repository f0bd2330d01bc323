"""regcn_tpu — a TPU-native temporal knowledge-graph message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
sgxxyyds/RE-GCN reference codebase (temporal KG extrapolation with
recurrent relational GCNs, hyperbolic encoders/decoders and history
retrieval), built TPU-first:

- snapshot graphs are flat padded edge arrays (src/dst/rel/mask), not
  dynamic graph objects, so every step compiles to static shapes;
- aggregation is gather -> fused edgewise GEMM -> segment-sum (XLA path)
  with a Pallas fused-scatter kernel on the hot path;
- the snapshot recurrence is a `lax.scan`, model state is an immutable
  pytree, parallelism is `jax.sharding` over a device mesh.

Reference parity notes cite `/root/reference/` as ``ref:<path>:<lines>``.
"""

__version__ = "0.1.0"

from regcn_tpu import config  # noqa: F401
