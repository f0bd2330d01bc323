from regcn_tpu.hisres import history, layers, model, train  # noqa: F401
from regcn_tpu.hisres.model import HisResConfig  # noqa: F401
