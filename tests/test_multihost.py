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


def _masked_rows(batches, keys):
    """Concatenate the valid rows of key arrays over a batch list."""
    out = {}
    for k in keys:
        rows = [b[k][np.asarray(b.get("valid", np.ones(len(b[k]), bool)))]
                for b in batches]
        out[k] = np.concatenate(rows)
    return out


def test_eval_loader_host_shards_reassemble(tmp_path):
    """3-view val batches from 2 simulated hosts must reassemble (valid
    rows, in order) to exactly the single-host batches — the eval-path
    analog of the train-loader bit-exactness test (VERDICT r2 item 2)."""
    from x3d_multigrid_tpu.data.kinetics import scan_kinetics
    from x3d_multigrid_tpu.data.loader import KineticsEvalLoader
    from x3d_multigrid_tpu.data.reader import PILReader
    from x3d_multigrid_tpu.data.synthetic import make_fake_kinetics

    root, anno, labels = make_fake_kinetics(
        str(tmp_path), n_classes=2, videos_per_class=1, n_frames=90,
        frame_size=(48, 48), val_videos_per_class=3)
    samples = scan_kinetics(root, anno, labels, "validate", min_frames=80)
    assert len(samples) == 6

    def batches(pi, pc):
        loader = KineticsEvalLoader(
            samples, reader=PILReader(), short_side=40, gamma_tau=10,
            frames=8, crops=3, batch_size=4, num_threads=2,
            process_index=pi, process_count=pc)
        out = list(loader)
        loader.close()
        return out

    full, h0, h1 = batches(0, 1), batches(0, 2), batches(1, 2)
    assert len(full) == len(h0) == len(h1) == 2
    got = _masked_rows([b for pair in zip(h0, h1) for b in pair],
                       ("clip", "label"))
    want = _masked_rows(full, ("clip", "label"))
    np.testing.assert_array_equal(got["clip"], want["clip"])
    np.testing.assert_array_equal(got["label"], want["label"])
    # per-host shares are equal-sized even on the ragged final chunk
    assert h0[-1]["clip"].shape[0] == h1[-1]["clip"].shape[0]


def test_eval_epoch_identical_across_simulated_hosts(tmp_path):
    """eval_epoch over batches assembled from 2 host slices == over the
    single-host batches (same Top-1, same sample count)."""
    from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
        KineticsRecipe, MultigridTrainer,
    )

    recipe = KineticsRecipe(
        batch_size=16, max_epochs=1, dataset_size=64, frames=16,
        crop_size_override=32, gamma_tau_override=2, short_side=40,
        base_bs_per_replica=4, const_bn_size=2, n_classes=5,
        compute_dtype=None, num_devices=8, warmup_steps=0,
        model_overrides=dict(
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((6, 4), (12, 8), (12, 8), (16, 8)),
            fc1_dim=16))
    trainer = MultigridTrainer(recipe)
    rng = np.random.RandomState(3)
    # a "global" ragged epoch: 10 videos in chunks of 8
    clips = rng.randint(0, 255, (10, 3, 8, 40, 40, 3), np.uint8)
    labels = rng.randint(0, 5, (10,)).astype(np.int32)

    def single_host():
        return [
            {"clip": clips[:8], "label": labels[:8],
             "valid": np.ones(8, bool)},
            {"clip": clips[8:], "label": labels[8:],
             "valid": np.ones(2, bool)},
        ]

    def assembled_two_hosts():
        # host shares of chunk 2 (len 2, per=1): h0=[8], h1=[9]; both pad 0
        z = np.zeros_like(clips[0])
        return [
            {"clip": clips[:8], "label": labels[:8],
             "valid": np.ones(8, bool)},
            {"clip": np.stack([clips[8], clips[9]]),
             "label": np.asarray([labels[8], labels[9]], np.int32),
             "valid": np.asarray([True, True])},
            {"clip": np.stack([z, z]),
             "label": np.asarray([-1, -1], np.int32),
             "valid": np.asarray([False, False])},
        ]

    acc1 = trainer.eval_epoch(single_host())
    acc2 = trainer.eval_epoch(assembled_two_hosts())
    assert acc1 == acc2


def test_charades_train_loader_host_shards_reassemble(tmp_path):
    """Charades train batches from 2 simulated hosts concatenate to the
    single-host global batch (same window/crop/flip RNG per clip)."""
    from x3d_multigrid_tpu.data.charades import scan_charades
    from x3d_multigrid_tpu.data.charades_loader import CharadesTrainLoader
    from x3d_multigrid_tpu.data.reader import PILReader
    from x3d_multigrid_tpu.data.synthetic import make_fake_charades

    root, anno = make_fake_charades(str(tmp_path), n_videos=4,
                                    n_frames=40, frame_size=(48, 48))
    videos = scan_charades(anno, "training", root, min_frames=34)

    def batches(pi, pc, n=2):
        loader = CharadesTrainLoader(
            videos, root, reader=PILReader(), task="class", batch_size=4,
            frames=32, gamma_tau=4, short_side=40, crop_size=32,
            scales=(0.875,), num_threads=2, seed=11,
            process_index=pi, process_count=pc)
        return list(loader.epoch(n))

    full, h0, h1 = batches(0, 1), batches(0, 2), batches(1, 2)
    for bf, b0, b1 in zip(full, h0, h1):
        for k in ("clip", "flip", "label"):
            np.testing.assert_array_equal(
                np.concatenate([b0[k], b1[k]]), bf[k])


def test_charades_eval_loaders_host_shards_reassemble(tmp_path):
    """Both Charades eval tasks: 2-host shards reassemble to the
    single-host batches; loc pads agree across hosts (computed from
    global chunk metadata)."""
    from x3d_multigrid_tpu.data.charades import scan_charades
    from x3d_multigrid_tpu.data.charades_loader import CharadesEvalLoader
    from x3d_multigrid_tpu.data.reader import PILReader
    from x3d_multigrid_tpu.data.synthetic import make_fake_charades

    root, anno = make_fake_charades(str(tmp_path), n_videos=9,
                                    n_frames=40, frame_size=(48, 48))
    videos = scan_charades(anno, "testing", root, min_frames=34)
    assert len(videos) == 3  # chunks of 2 + ragged 1 (empty-host pad case)

    for task in ("class", "loc"):
        def batches(pi, pc):
            loader = CharadesEvalLoader(
                videos, root, reader=PILReader(), task=task, batch_size=2,
                frames=32, gamma_tau=4, short_side=40, crops=3,
                num_threads=2, t_pad_multiple=4, tl_pad_multiple=8,
                process_index=pi, process_count=pc)
            return list(loader)

        full, h0, h1 = batches(0, 1), batches(0, 2), batches(1, 2)
        assert len(full) == len(h0) == len(h1)
        keys = ("clip", "label") if task == "class" else \
            ("clip", "label", "mask")
        got = _masked_rows([b for pair in zip(h0, h1) for b in pair], keys)
        want = _masked_rows(full, keys)
        for k in keys:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        for b0, b1 in zip(h0, h1):
            assert b0["clip"].shape == b1["clip"].shape


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


def test_initialize_warns_when_autodetect_fails(monkeypatch):
    """A cluster env marker with failed auto-detection must WARN (silent
    degrade to N independent runs duplicates data and clobbers ckpts)."""
    import warnings
    monkeypatch.setenv("SLURM_JOB_ID", "12345")

    def boom(**kw):
        raise ValueError("could not find coordinator")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.warns(RuntimeWarning, match="auto-detection failed"):
        multihost_initialize()
    # explicit arguments must still fail loudly
    with pytest.raises(ValueError):
        multihost_initialize(coordinator_address="1.2.3.4:99",
                             num_processes=2, process_id=0)
