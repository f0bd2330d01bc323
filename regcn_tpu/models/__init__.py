from regcn_tpu.models import layers, decoders, recurrent  # noqa: F401
