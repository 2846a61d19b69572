"""Data pipeline tests: temporal sampling semantics, dataset scanning,
loader end-to-end on a synthetic frame-folder dataset, device preprocessing."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.data.temporal import (
    loop_pad, temporal_random_crop, eval_temporal_views,
)
from x3d_multigrid_tpu.data.spatial import (
    sample_train_crop_params, center_square_crop, train_scales,
)
from x3d_multigrid_tpu.data.kinetics import scan_kinetics, load_class_labels
from x3d_multigrid_tpu.data import charades as ch
from x3d_multigrid_tpu.data.reader import PILReader
from x3d_multigrid_tpu.data.loader import (
    ShuffledIndexStream, KineticsTrainLoader, KineticsEvalLoader,
)
from x3d_multigrid_tpu.data.synthetic import (
    make_fake_kinetics, make_fake_charades,
)
from x3d_multigrid_tpu.multigrid import MultigridConfig, MultigridSchedule
from x3d_multigrid_tpu.ops.preprocess import train_preprocess, eval_preprocess


class TestTemporal:
    def test_loop_pad(self):
        assert loop_pad([3, 4], 5) == [3, 4, 3, 4, 3]
        assert loop_pad([1, 2, 3], 2) == [1, 2, 3]  # ref never truncates

    def test_random_crop_stride_and_trunc(self):
        rng = np.random.RandomState(0)
        idx = list(range(1, 101))
        out = temporal_random_crop(idx, size=80, gamma_tau=10, t_stride=1,
                                   trunc=40, rng=rng)
        assert len(out) == 4  # trunc // gamma_tau
        # consecutive sampled indices are gamma_tau*t_stride apart
        diffs = np.diff(out)
        assert set(diffs) <= {10}

    def test_random_crop_loop_pads_short_windows(self):
        rng = np.random.RandomState(1)
        idx = list(range(1, 30))
        out = temporal_random_crop(idx, size=80, gamma_tau=10, t_stride=2,
                                   trunc=80, rng=rng)
        assert len(out) == 8  # padded up to trunc//gamma_tau

    def test_eval_views_even_coverage(self):
        views = eval_temporal_views(n_frames=300, gamma_tau=10, frames=8,
                                    crops=3)
        assert len(views) == 3
        assert all(len(v) == 8 for v in views)
        # views slide forward
        starts = [v[0] for v in views]
        assert starts == sorted(starts)
        # all indices subsampled at gamma_tau from 1-based range
        for v in views:
            assert all((i - 1) % 10 == 0 for i in v)

    def test_eval_views_short_video_duplicates(self):
        views = eval_temporal_views(n_frames=85, gamma_tau=10, frames=8,
                                    crops=3)
        assert len(views) == 3
        assert views[0] == views[1] == views[2]


class TestSpatial:
    def test_scales_match_reference_m(self):
        assert train_scales(224, [256.0, 256.0]) == (0.875, 0.875)

    def test_crop_params_in_bounds(self):
        rng = np.random.RandomState(0)
        for _ in range(50):
            p = sample_train_crop_params(342, 256, (0.875,), rng)
            assert p.side == int(256 * 0.875)
            assert 0 <= p.x1 <= 342 - p.side
            assert 0 <= p.y1 <= 256 - p.side

    def test_center_square(self):
        assert center_square_crop(342, 256) == (43, 0, 256)


@pytest.fixture(scope="module")
def fake_kinetics(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kin"))
    return make_fake_kinetics(root, n_classes=3, videos_per_class=2,
                              n_frames=90, frame_size=(64, 48))


class TestKineticsIndex:
    def test_scan_and_cache(self, fake_kinetics):
        root, anno, labels = fake_kinetics
        samples = scan_kinetics(root, anno, labels, "train", min_frames=80)
        assert len(samples) == 6
        assert all(s.n_frames == 90 for s in samples)
        assert {s.label for s in samples} == {0, 1, 2}
        # cache hit returns the same index
        again = scan_kinetics(root, anno, labels, "train", min_frames=80)
        assert [s.video for s in again] == [s.video for s in samples]

    def test_min_frames_filter(self, fake_kinetics):
        root, anno, labels = fake_kinetics
        samples = scan_kinetics(root, anno, labels, "train", min_frames=95,
                                cache=False)
        assert samples == []


class TestTrainLoader:
    def test_multigrid_batches_have_plan_shapes(self, fake_kinetics):
        root, anno, labels = fake_kinetics
        samples = scan_kinetics(root, anno, labels, "train", min_frames=80)
        cfg = MultigridConfig(
            base_batch_size=2, total_iterations=64, sample_duration=80,
            crop_size=32, gamma_tau=10, base_bn_splits=1)
        sched = MultigridSchedule(cfg)
        loader = KineticsTrainLoader(
            samples, sched, reader=PILReader(), short_side=40, crop_size=32,
            scales=(0.875,), gamma_tau=10, num_threads=2)
        batches = list(loader.epoch(4))
        assert len(batches) == 4
        for b in batches:
            plan = b["plan"]
            # adaptive decode: crops come out at the short-cycle size
            assert b["clip"].shape == (
                plan.batch_size, plan.frames, plan.crop, plan.crop, 3)
            assert b["clip"].dtype == np.uint8
            assert b["label"].shape == (plan.batch_size,)
            assert b["flip"].dtype == bool

    def test_fixed_decode_mode(self, fake_kinetics):
        root, anno, labels = fake_kinetics
        samples = scan_kinetics(root, anno, labels, "train", min_frames=80)
        cfg = MultigridConfig(
            base_batch_size=2, total_iterations=64, sample_duration=80,
            crop_size=32, gamma_tau=10, base_bn_splits=1)
        loader = KineticsTrainLoader(
            samples, MultigridSchedule(cfg), reader=PILReader(),
            short_side=40, crop_size=32, scales=(0.875,), gamma_tau=10,
            num_threads=2, adaptive_decode=False)
        b = next(iter(loader.epoch(1)))
        assert b["clip"].shape[2:] == (32, 32, 3)

    def test_process_executor_bit_identical_to_threads(self, fake_kinetics):
        """executor='process' (pod-scale decode fan-out over worker
        processes) must yield byte-identical batches to the default
        thread pool: same index stream, same per-clip seeds."""
        root, anno, labels = fake_kinetics
        samples = scan_kinetics(root, anno, labels, "train", min_frames=80)
        cfg = MultigridConfig(
            base_batch_size=2, total_iterations=64, sample_duration=80,
            crop_size=32, gamma_tau=10, base_bn_splits=1)

        def batches(executor):
            loader = KineticsTrainLoader(
                samples, MultigridSchedule(cfg), reader=PILReader(),
                short_side=40, crop_size=32, scales=(0.875,), gamma_tau=10,
                num_threads=2, seed=3, executor=executor)
            out = list(loader.epoch(2))
            loader.close()
            return out

        for bt, bp in zip(batches("thread"), batches("process")):
            np.testing.assert_array_equal(bt["clip"], bp["clip"])
            np.testing.assert_array_equal(bt["flip"], bp["flip"])
            np.testing.assert_array_equal(bt["label"], bp["label"])

    def test_shuffled_stream_covers_dataset(self):
        s = ShuffledIndexStream(10, seed=0)
        first = s.take(10)
        assert sorted(first) == list(range(10))
        second = s.take(10)
        assert sorted(second) == list(range(10))
        assert first != second  # reshuffled


class TestEvalLoader:
    def test_views_shape(self, fake_kinetics):
        root, anno, labels = fake_kinetics
        samples = scan_kinetics(root, anno, labels, "train", min_frames=80)
        loader = KineticsEvalLoader(
            samples, reader=PILReader(), short_side=40, gamma_tau=10,
            frames=8, crops=3, batch_size=4, num_threads=2)
        batch = next(iter(loader))
        assert batch["clip"].shape == (4, 3, 8, 40, 40, 3)


class TestCharades:
    @pytest.fixture(scope="class")
    def fake(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("cha"))
        return make_fake_charades(root, n_videos=3, n_frames=170)

    def test_scan_split(self, fake):
        root, split = fake
        train = ch.scan_charades(split, "training", root)
        test = ch.scan_charades(split, "testing", root)
        assert len(train) == 2 and len(test) == 1

    def test_label_matrix_intervals(self, fake):
        root, split = fake
        v = ch.scan_charades(split, "training", root)[0]
        lab = ch.label_matrix(v)
        assert lab.shape == (170, 157)
        fps = v.n_frames / v.duration
        cls, start, end = v.actions[0]
        active = np.where(lab[:, cls] > 0)[0]
        assert active.size
        assert np.all(active / fps > start)
        assert np.all(active / fps < end)

    def test_train_window_shapes(self, fake):
        root, split = fake
        v = ch.scan_charades(split, "training", root)[0]
        rng = np.random.RandomState(0)
        idx, lab = ch.train_window(v, frames=160, gamma_tau=10, rng=rng)
        assert len(idx) == 16
        assert lab.shape == (160, 157)
        assert 1 <= idx[0] and idx[-1] <= v.n_frames

    def test_pad_collate(self):
        clips = [np.ones((4, 8, 8, 3), np.float32),
                 np.ones((6, 8, 8, 3), np.float32)]
        labels = [np.ones((20, 157), np.float32),
                  np.ones((30, 157), np.float32)]
        out = ch.pad_collate(clips, labels)
        assert out["clip"].shape == (2, 6, 8, 8, 3)
        assert out["label"].shape == (2, 30, 157)
        np.testing.assert_array_equal(out["mask"][0, :20], 1)
        np.testing.assert_array_equal(out["mask"][0, 20:], 0)


_REAL_CHARADES = "/root/reference/data/charades.json"


@pytest.mark.skipif(not os.path.exists(_REAL_CHARADES),
                    reason="reference charades.json not present")
class TestCharadesRealAnnotations:
    """Parse the ACTUAL 9,848-video annotation file the reference ships
    (not a synthetic fixture) — the format our scanner must accept in
    production (reference charades.py:68-104)."""

    def test_full_file_parses_with_expected_splits(self, tmp_path):
        import json
        with open(_REAL_CHARADES) as f:
            data = json.load(f)
        assert len(data) == 9848  # SURVEY §2 #13
        subsets = {}
        for m in data.values():
            subsets[m["subset"]] = subsets.get(m["subset"], 0) + 1
        assert subsets == {"training": 7985, "testing": 1863}
        # scan over the real file with no frame dirs on disk -> empty, no
        # parse errors on any of the 9,848 entries
        assert ch.scan_charades(_REAL_CHARADES, "training",
                                str(tmp_path)) == []

    def test_scan_and_label_matrix_on_real_video(self, tmp_path):
        import json
        with open(_REAL_CHARADES) as f:
            data = json.load(f)
        # first training video WITH actions (some entries have none)
        vid, meta = next((k, m) for k, m in data.items()
                         if m["subset"] == "training" and m["actions"])
        n_frames = 170
        vdir = tmp_path / vid
        vdir.mkdir()
        for i in range(1, n_frames + 1):
            (vdir / f"{vid}-{str(i).zfill(6)}.jpg").touch()
        vids = ch.scan_charades(_REAL_CHARADES, "training", str(tmp_path))
        assert len(vids) == 1 and vids[0].vid == vid
        v = vids[0]
        assert v.duration == float(meta["duration"])
        assert v.n_frames == n_frames
        assert v.actions == [(int(a[0]), float(a[1]), float(a[2]))
                             for a in meta["actions"]]
        lab = ch.label_matrix(v)
        assert lab.shape == (n_frames, 157)
        # every annotated interval inside the duration lights frames
        fps = n_frames / v.duration
        for cls, start, end in v.actions:
            if end - start > 2.0 / fps and start < v.duration:
                assert lab[:, cls].any(), (cls, start, end)


class TestDevicePreprocess:
    def test_train_preprocess_normalize_and_flip(self):
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, (2, 3, 16, 16, 3), np.uint8)
        mean = jnp.asarray([0.4, 0.4, 0.4])
        std = jnp.asarray([0.2, 0.2, 0.2])
        flip = jnp.asarray([True, False])
        out = train_preprocess(jnp.asarray(frames), flip, mean, std,
                               out_size=16)
        expect0 = (frames[0].astype(np.float32) / 255.0 - 0.4) / 0.2
        np.testing.assert_allclose(out[0], expect0[:, :, ::-1, :],
                                   rtol=1e-5, atol=1e-5)
        expect1 = (frames[1].astype(np.float32) / 255.0 - 0.4) / 0.2
        np.testing.assert_allclose(out[1], expect1, rtol=1e-5, atol=1e-5)

    def test_resize_matches_pil_downscale(self):
        """Device antialiased bilinear ~ PIL BILINEAR on downscale."""
        from PIL import Image
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (32, 32, 3), np.uint8)
        pil = np.asarray(Image.fromarray(img).resize((16, 16),
                                                     Image.BILINEAR),
                         np.float32) / 255.0
        frames = img[None, None]
        out = eval_preprocess(jnp.asarray(frames), jnp.zeros(3),
                              jnp.ones(3), out_size=16)
        diff = np.abs(np.asarray(out[0, 0]) - pil)
        assert diff.mean() < 0.02, diff.mean()
