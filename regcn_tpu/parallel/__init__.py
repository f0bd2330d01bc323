from regcn_tpu.parallel.mesh import make_mesh, MeshAxes  # noqa: F401
from regcn_tpu.parallel.sharding import (  # noqa: F401
    shard_params,
    make_sharded_train_step,
    param_sharding_rules,
)
