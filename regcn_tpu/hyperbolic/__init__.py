from regcn_tpu.hyperbolic import decoders, est, gru, layers, model, ops  # noqa: F401
from regcn_tpu.hyperbolic.model import HyperbolicConfig  # noqa: F401
