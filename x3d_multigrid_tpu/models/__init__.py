from x3d_multigrid_tpu.models.x3d import (
    X3DConfig,
    x3d_config,
    init_params,
    init_bn_state,
    forward,
    replace_logits,
    resize_bn_splits,
    aggregate_all_subbn,
)

__all__ = [
    "X3DConfig",
    "x3d_config",
    "init_params",
    "init_bn_state",
    "forward",
    "replace_logits",
    "resize_bn_splits",
    "aggregate_all_subbn",
]
