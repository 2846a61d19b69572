from x3d_multigrid_tpu.multigrid.schedule import (
    IterationPlan,
    MultigridSchedule,
    MultigridConfig,
    long_cycle_shapes,
    short_cycle_crop,
)
from x3d_multigrid_tpu.multigrid.buckets import ShapeBucket, enumerate_buckets

__all__ = [
    "IterationPlan",
    "MultigridSchedule",
    "MultigridConfig",
    "long_cycle_shapes",
    "short_cycle_crop",
    "ShapeBucket",
    "enumerate_buckets",
]
