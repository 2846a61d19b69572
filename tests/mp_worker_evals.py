"""Worker for the REAL multi-process DP integration test.

Launched twice (process_id 0/1) by tests/test_multiprocess_dp.py: each
process owns 4 virtual CPU devices, joins a 2-process jax.distributed
group over localhost, and runs the multi-host eval paths end-to-end —
including the ragged final chunks where one host's entire share is
padding, the exact layouts whose collectives must stay host-symmetric
(the reference never had a pod story at all; SURVEY §5.8).

Usage: python tests/mp_worker_evals.py <process_id> <port> <out.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root: x3d_multigrid_tpu + tests


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from x3d_multigrid_tpu.parallel import multihost_initialize
    multihost_initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np
    from tests.mp_eval_case import (
        kinetics_trainer, charades_trainer, kinetics_batches,
        charades_batches, run_train_steps,
    )

    result = {}

    # -- Training: host_shard slices -> global assembly -> psum'd SGD
    # steps spanning a multigrid bucket or two. -----------------------------
    result.update(run_train_steps())

    # -- Kinetics 3-view eval: 9 videos in global chunks of 8 -> final
    # chunk has 1 video; host 1's share is ALL padding. --------------------
    trainer = kinetics_trainer()
    result["kinetics_top1"] = float(
        trainer.eval_epoch(kinetics_batches(pid, 2)))

    # -- Charades class eval: same ragged layout through _gather_rows
    # (per-batch process_allgather collectives). ---------------------------
    ctrainer = charades_trainer()
    out = ctrainer.eval_class_epoch(charades_batches(pid, 2))
    result["charades_map"] = float(out["map"])
    result["charades_loss"] = float(out["loss"])

    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}] done: {result}", flush=True)


if __name__ == "__main__":
    main()
