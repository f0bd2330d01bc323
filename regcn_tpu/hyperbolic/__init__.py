from regcn_tpu.hyperbolic import ops  # noqa: F401
