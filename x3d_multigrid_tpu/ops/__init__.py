from x3d_multigrid_tpu.ops.swish import swish
from x3d_multigrid_tpu.ops.conv3d import (
    conv3d,
    pointwise_conv3d,
    depthwise_conv3d,
)
from x3d_multigrid_tpu.ops.subbn import (
    SubBNState,
    init_subbn_state,
    sub_batch_norm,
    aggregate_subbn_stats,
    resize_subbn_splits,
)

__all__ = [
    "swish",
    "conv3d",
    "pointwise_conv3d",
    "depthwise_conv3d",
    "SubBNState",
    "init_subbn_state",
    "sub_batch_norm",
    "aggregate_subbn_stats",
    "resize_subbn_splits",
]
