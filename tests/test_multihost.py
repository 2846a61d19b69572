"""Multi-host helpers: shard arithmetic, global-array assembly, and a DP
train step fed through make_array_from_process_local_data on the
8-virtual-device mesh (single-process identity of the pod path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.parallel import (
    data_mesh, make_train_step, multihost_initialize, host_shard,
    global_batch_from_local, process_info,
)
from x3d_multigrid_tpu.train import init_momentum


def test_initialize_single_process_noop():
    multihost_initialize()  # must not raise, must not require a coordinator
    info = process_info()
    assert info["process_count"] == 1
    assert info["process_index"] == 0
    assert info["global_device_count"] >= 8


def test_host_shard_partitions_exactly():
    slices = [host_shard(128, process_index=i, process_count=4)
              for i in range(4)]
    idx = np.arange(128)
    parts = [idx[s] for s in slices]
    np.testing.assert_array_equal(np.concatenate(parts), idx)
    assert all(len(p) == 32 for p in parts)
    with pytest.raises(ValueError):
        host_shard(100, process_index=0, process_count=3)


def test_global_batch_assembly_matches_device_put():
    mesh = data_mesh(8)
    rng = np.random.RandomState(0)
    local = {"clip": rng.randint(0, 255, (16, 2, 8, 8, 3), np.uint8),
             "label": rng.randint(0, 11, (16,), np.int32)}
    tree = global_batch_from_local(mesh, local)
    assert tree["clip"].shape == (16, 2, 8, 8, 3)
    # single-process: the global array must hold exactly the local data
    np.testing.assert_array_equal(np.asarray(tree["clip"]), local["clip"])
    np.testing.assert_array_equal(np.asarray(tree["label"]), local["label"])
    # and be sharded across all 8 devices on the batch axis
    assert len(tree["clip"].sharding.device_set) == 8


def test_loader_host_shards_reassemble_to_global_batch(tmp_path):
    """Two fake hosts with the same seed must produce slices that
    concatenate to exactly the single-host global batch (same indices,
    same per-clip seeds -> same crops/flips/labels)."""
    from x3d_multigrid_tpu.data.kinetics import scan_kinetics
    from x3d_multigrid_tpu.data.loader import KineticsTrainLoader
    from x3d_multigrid_tpu.data.reader import PILReader
    from x3d_multigrid_tpu.data.synthetic import make_fake_kinetics
    from x3d_multigrid_tpu.multigrid import MultigridConfig, \
        MultigridSchedule

    root, anno, labels = make_fake_kinetics(
        str(tmp_path), n_classes=2, videos_per_class=2, n_frames=90,
        frame_size=(48, 48))
    samples = scan_kinetics(root, anno, labels, "train", min_frames=80)
    cfg = MultigridConfig(base_batch_size=4, total_iterations=64,
                          sample_duration=80, crop_size=32, gamma_tau=10,
                          base_bn_splits=1)

    def batches(process_index, process_count, n=3):
        loader = KineticsTrainLoader(
            samples, MultigridSchedule(cfg), reader=PILReader(),
            short_side=40, crop_size=32, scales=(0.875,), gamma_tau=10,
            num_threads=2, seed=7, process_index=process_index,
            process_count=process_count)
        out = list(loader.epoch(n))
        loader.close()
        return out

    full = batches(0, 1)
    h0 = batches(0, 2)
    h1 = batches(1, 2)
    for bf, b0, b1 in zip(full, h0, h1):
        assert b0["clip"].shape[0] == bf["clip"].shape[0] // 2
        np.testing.assert_array_equal(
            np.concatenate([b0["clip"], b1["clip"]]), bf["clip"])
        np.testing.assert_array_equal(
            np.concatenate([b0["label"], b1["label"]]), bf["label"])
        np.testing.assert_array_equal(
            np.concatenate([b0["flip"], b1["flip"]]), bf["flip"])


def test_train_step_consumes_assembled_batch():
    cfg = x3d_config("M", n_classes=7, blocks_override=(1, 1, 1, 1),
                     inplanes_override=((6, 4), (12, 8), (12, 8), (16, 8)))
    mesh = data_mesh(8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bn = init_bn_state(cfg, num_splits=2)
    mom = init_momentum(params)
    step = make_train_step(cfg, mesh, loss="kinetics", donate=False)
    rng = np.random.RandomState(1)
    local = {
        "clip": rng.rand(16, 2, 16, 16, 3).astype(np.float32),
        "label": rng.randint(0, 7, (16,), np.int32),
    }
    batch = global_batch_from_local(mesh, local)
    p, m, s, out = step(params, mom, bn, batch, jnp.float32(0.1),
                        jax.random.PRNGKey(2), out_size=16)
    assert np.isfinite(float(out.loss))
