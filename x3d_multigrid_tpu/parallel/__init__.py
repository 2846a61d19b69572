from x3d_multigrid_tpu.parallel.mesh import data_mesh
from x3d_multigrid_tpu.parallel.multihost import (
    initialize as multihost_initialize, host_shard, global_batch_from_local,
    process_info, local_rows, all_hosts_sum,
)
from x3d_multigrid_tpu.parallel.spatial import (
    data_spatial_mesh, make_sharded_eval_step, shard_clip,
)
from x3d_multigrid_tpu.parallel.train_step import (
    make_train_step, make_train_loop, make_grad_accum_step,
    make_grad_microstep, make_apply_step, accumulate_grads, make_eval_step,
    TrainStepOutputs,
)

__all__ = [
    "data_mesh",
    "data_spatial_mesh",
    "make_sharded_eval_step",
    "shard_clip",
    "multihost_initialize",
    "host_shard",
    "global_batch_from_local",
    "process_info",
    "local_rows",
    "all_hosts_sum",
    "make_train_step",
    "make_train_loop",
    "make_grad_accum_step",
    "make_grad_microstep",
    "make_apply_step",
    "accumulate_grads",
    "make_eval_step",
    "TrainStepOutputs",
]
