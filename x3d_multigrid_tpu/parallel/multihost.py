"""Multi-host (multi-process) data-parallel training support.

The reference tops out at single-process ``nn.DataParallel`` over 2-4
GPUs (SURVEY §2.3, train_x3d_kinetics_multigrid.py:177).  On TPU pods,
JAX runs one process per host: each process sees only its
``jax.local_devices()``, while ``jax.devices()`` spans the pod.  The
existing shard_map train/eval steps (parallel/train_step.py) work
unchanged over a *global* 1-D mesh — what multi-host adds is:

1. process-group bootstrap (``initialize`` -> ``jax.distributed``),
2. a deterministic split of every global batch so each host's loader
   decodes only its slice (``host_shard``), and
3. assembly of per-host numpy shards into one global sharded array
   (``global_batch_from_local`` -> ``make_array_from_process_local_data``)
   that pjit/shard_map consume without any cross-host data movement —
   gradient psums ride ICI/DCN via XLA collectives.

Single-process use is the no-op identity of all three, so recipes can
call these helpers unconditionally.
"""

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x3d_multigrid_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap the JAX process group (no-op when single-process).

    On TPU pods the three arguments are auto-detected from the
    environment; pass them explicitly only for CPU/GPU clusters.  Safe to
    call twice (the second call is ignored).
    """
    if num_processes is None and coordinator_address is None:
        # Single-host runs (and tests) never need a coordinator.
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError:  # already initialized
        pass


def process_info() -> Dict[str, int]:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def host_shard(global_batch_size: int,
               process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> slice:
    """The contiguous slice of each global batch this host must load.

    Every host runs the identical multigrid schedule (same seed, same
    ``IterationPlan`` stream), so slicing the *index list* per host keeps
    the global batch exactly what a single-host run would have produced.
    ``global_batch_size`` must divide evenly by the process count (the
    multigrid buckets are powers of two; any process count that divides
    the finest batch divides them all).
    """
    pid = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    per = global_batch_size // n
    return slice(pid * per, (pid + 1) * per)


def global_batch_from_local(mesh: Mesh, local_batch: Dict[str, Any]):
    """Assemble per-host numpy shards into global batch-sharded arrays.

    ``local_batch`` holds this host's ``host_shard`` slice of every batch
    leaf (leading dim = global_batch / process_count).  Returns a pytree
    of ``jax.Array`` sharded ``P(DATA_AXIS)`` over ``mesh`` — each shard
    lands on this host's local devices; no cross-host transfer happens.

    Single-process this is just a sharded ``device_put``.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)
