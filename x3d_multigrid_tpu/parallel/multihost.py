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

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x3d_multigrid_tpu.parallel.mesh import DATA_AXIS

# Environment markers of a multi-process cluster that
# jax.distributed.initialize() knows how to auto-detect (TPU pods, Slurm,
# GKE/JobSet, or an explicit coordinator).  When none of these is present
# the run is provably single-process and no coordinator is needed.
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_ID", "JOBSET_NAME",
)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap the JAX process group (no-op when single-process).

    With no arguments, the cluster layout is auto-detected from the
    environment (TPU pod metadata, Slurm, GKE) — this is what starts the
    coordination service that orbax multi-host async saves and barriers
    depend on, so pods MUST reach ``jax.distributed.initialize``.  Only a
    run with none of the known cluster markers short-circuits.  Safe to
    call twice (the second call is ignored).
    """
    explicit = (coordinator_address is not None
                or num_processes is not None)
    if not explicit and not any(v in os.environ
                                for v in _CLUSTER_ENV_VARS):
        # Provably single-process: no coordinator env anywhere.
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError:  # already initialized
        pass
    except ValueError as e:
        # A cluster marker was present but JAX's auto-detection found no
        # coordinator (e.g. a single-host TPU behind a tunnel exporting
        # pod-style env vars).  Explicit arguments must still fail loudly;
        # auto-detection failures must at least WARN — on a real multi-node
        # launch this degrade means N independent single-host runs that
        # duplicate data and clobber each other's checkpoints.
        if explicit:
            raise
        import warnings
        markers = [v for v in _CLUSTER_ENV_VARS if v in os.environ]
        warnings.warn(
            f"jax.distributed.initialize() auto-detection failed ({e}) "
            f"despite cluster env markers {markers}; continuing as a "
            f"single process. If this is a multi-node launch, pass "
            f"coordinator_address/num_processes/process_id explicitly.",
            RuntimeWarning, stacklevel=2)


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


def local_rows(arr) -> np.ndarray:
    """This host's contiguous rows of a batch-sharded global array.

    The inverse of :func:`global_batch_from_local` for step *outputs*
    (e.g. eval logits sharded ``P(DATA_AXIS)``): each host's addressable
    shards hold exactly the rows that came from its own local batch, so
    metrics can be computed host-locally and then summed across processes.
    Single-process this is the whole array.
    """
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def all_hosts_sum(*values: float):
    """Sum scalars across processes (identity when single-process).

    Rides the same mesh collectives as training — a tiny jitted psum over
    one device per host would also work, but ``process_allgather`` keeps
    this off the compile path.
    """
    if jax.process_count() == 1:
        return values if len(values) > 1 else values[0]
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.asarray(values, np.float64))
    total = np.sum(gathered, axis=0)
    return tuple(total.tolist()) if len(values) > 1 else float(total[0])
