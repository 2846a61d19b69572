"""Transform catalog semantics vs reference formulas."""

import numpy as np
import pytest

from x3d_multigrid_tpu.data import transforms as T
from x3d_multigrid_tpu.data.kinetics import VideoSample


class TestSpatial:
    def test_scale_short_side(self):
        assert T.scale_short_side(342, 256, 256) == (342, 256)
        assert T.scale_short_side(342, 256, 128) == (171, 128)
        assert T.scale_short_side(256, 342, 128) == (128, 171)

    def test_center_crop(self):
        r = T.center_crop(342, 256, 224)
        assert (r.x1, r.y1, r.w, r.h) == (59, 16, 224, 224)

    def test_center_crop_scaled(self):
        r = T.center_crop_scaled(342, 256, 224)
        assert (r.x1, r.y1, r.w, r.h) == (43, 0, 256, 256)
        assert r.resize_to == (224, 224)

    @pytest.mark.parametrize("pos,expect", [
        ("tl", (0, 0)), ("tr", (242, 0)), ("bl", (0, 156)),
        ("br", (242, 156)), ("c", (121, 78)),
    ])
    def test_corner_crop(self, pos, expect):
        r = T.corner_crop(342, 256, 100, pos)
        assert (r.x1, r.y1) == expect
        assert (r.w, r.h) == (100, 100)

    def test_multiscale_random_crop_bounds(self):
        rng = np.random.RandomState(0)
        for _ in range(50):
            r = T.sample_multiscale_random_crop(342, 256, (0.875, 0.7),
                                                111, rng)
            assert 0 <= r.x1 <= 342 - r.w
            assert 0 <= r.y1 <= 256 - r.h
            assert r.w in (int(256 * 0.875), int(256 * 0.7))
            assert r.resize_to == (111, 111)

    def test_apply_to_array_flip_and_resize(self):
        frame = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        r = T.CropRect(1, 0, 4, 4)
        out = T.apply_to_array(frame, r, hflip=True)
        np.testing.assert_array_equal(out, frame[:, 1:5][:, ::-1])
        r2 = T.CropRect(0, 0, 4, 4, resize_to=(2, 2))
        assert T.apply_to_array(frame, r2).shape == (2, 2, 3)

    def test_to_tensor_and_normalize(self):
        u8 = np.array([[[255, 0, 128]]], np.uint8)
        f = T.to_tensor(u8)
        np.testing.assert_allclose(f, [[[1.0, 0.0, 128 / 255]]])
        n = T.normalize(f, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
        np.testing.assert_allclose(n[0, 0, 0], 2.0)


class TestTemporal:
    def test_begin_crop(self):
        assert T.temporal_begin_crop(list(range(1, 11)), 4) == [1, 2, 3, 4]
        assert T.temporal_begin_crop([1, 2], 5) == [1, 2, 1, 2, 1]

    def test_center_crop(self):
        out = T.temporal_center_crop(list(range(1, 11)), 4)
        assert out == [4, 5, 6, 7]
        assert T.temporal_center_crop([1, 2], 5) == [1, 2, 1, 2, 1]


class TestTargets:
    def test_selectors(self):
        s = VideoSample(video="/x", n_frames=10, label=3, video_id="vid7")
        assert T.class_label(s) == 3
        assert T.video_id(s) == "vid7"
        assert T.compose(T.class_label, T.video_id)(s) == (3, "vid7")
