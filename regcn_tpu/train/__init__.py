from regcn_tpu.train import loop, metrics, state  # noqa: F401
