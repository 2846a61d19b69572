"""REAL multi-process data parallelism: two jax.distributed processes
(4 virtual CPU devices each) run the multi-host eval paths end-to-end and
must reproduce the single-process numbers exactly.

This is the strongest pod-fidelity test in the suite: unlike the
simulated-host tests (test_multihost.py), the collectives here —
``make_array_from_process_local_data`` feeds, the sharded eval step,
``process_allgather`` in ``_gather_rows``/``all_hosts_sum`` — actually
cross a process boundary, so host-asymmetric collective calls (the
classic ragged-final-chunk bug class) deadlock or crash instead of
silently passing.  The fixture deliberately includes a final chunk where
one host's entire share is padding.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import tests.mp_eval_case as case

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PORT = "19733"


def _spawn(pid: int, out: str) -> subprocess.Popen:
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    return subprocess.Popen(
        [sys.executable, os.path.join(_ROOT, "tests", "mp_worker_evals.py"),
         str(pid), _PORT, out],
        cwd=_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_two_process_eval_matches_single_process(tmp_path):
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    procs = [_spawn(i, o) for i, o in enumerate(outs)]
    logs = []
    try:
        for p in procs:
            log, _ = p.communicate(timeout=900)
            logs.append(log)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process eval deadlocked (host-asymmetric "
                    "collective?); partial logs:\n" + "\n".join(logs))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    # both hosts must agree (they see the same global metrics)
    for key in results[0]:
        assert results[0][key] == pytest.approx(results[1][key],
                                                rel=1e-6), key

    # single-process reference on this process's 8 virtual devices
    ref_train = case.run_train_steps()
    ktr = case.kinetics_trainer()
    want_top1 = float(ktr.eval_epoch(case.kinetics_batches(0, 1)))
    ctr = case.charades_trainer()
    want = ctr.eval_class_epoch(case.charades_batches(0, 1))

    assert results[0]["kinetics_top1"] == pytest.approx(want_top1,
                                                        abs=1e-9)
    assert results[0]["charades_map"] == pytest.approx(
        float(want["map"]), abs=1e-6)
    assert results[0]["charades_loss"] == pytest.approx(
        float(want["loss"]), rel=1e-5)
    # step 0 runs on identical params and an identically-assembled global
    # batch -> must match to float precision; later steps see gradients
    # reduced by a DIFFERENT collective implementation (cross-process
    # Gloo ring vs in-process reduction), so the trajectory is only
    # approximately equal (measured divergence ~0.7% by step 3 on this
    # deliberately BN-sensitive tiny model)
    assert results[0]["train_losses"][0] == pytest.approx(
        ref_train["train_losses"][0], rel=1e-6)
    np.testing.assert_allclose(results[0]["train_losses"],
                               ref_train["train_losses"], rtol=5e-2)
    assert results[0]["param_checksum"] == pytest.approx(
        ref_train["param_checksum"], rel=2e-2)
