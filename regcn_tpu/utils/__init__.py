from regcn_tpu.utils import init  # noqa: F401
