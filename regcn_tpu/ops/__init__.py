from regcn_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    masked_segment_sum,
    masked_segment_mean,
    segment_softmax,
)
from regcn_tpu.ops.activations import rrelu  # noqa: F401
from regcn_tpu.ops.rgcn_scatter import rgcn_aggregate  # noqa: F401
