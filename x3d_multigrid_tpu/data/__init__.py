from x3d_multigrid_tpu.data.temporal import (
    temporal_random_crop, eval_temporal_views, loop_pad,
)
from x3d_multigrid_tpu.data.spatial import (
    sample_train_crop_params, TrainCropParams,
)

__all__ = [
    "temporal_random_crop",
    "eval_temporal_views",
    "loop_pad",
    "sample_train_crop_params",
    "TrainCropParams",
]
