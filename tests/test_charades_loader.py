"""Charades host-loader end-to-end tests on a synthetic frame-folder
dataset."""

import numpy as np
import pytest

from x3d_multigrid_tpu.data import charades as ch
from x3d_multigrid_tpu.data.charades_loader import (
    CharadesTrainLoader, CharadesEvalLoader,
)
from x3d_multigrid_tpu.data.reader import PILReader
from x3d_multigrid_tpu.data.synthetic import make_fake_charades


@pytest.fixture(scope="module")
def fake(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chl"))
    return make_fake_charades(root, n_videos=4, n_frames=200,
                              frame_size=(64, 48))


def _videos(fake, split):
    root, split_file = fake
    return ch.scan_charades(split_file, split, root,
                            min_frames=100), root


class TestTrainLoader:
    @pytest.mark.parametrize("task", ["class", "loc"])
    def test_batches(self, fake, task):
        videos, root = _videos(fake, "training")
        loader = CharadesTrainLoader(
            videos, root, reader=PILReader(), task=task, batch_size=3,
            frames=64, gamma_tau=8, short_side=40, crop_size=32,
            scales=(0.875,), num_threads=2)
        batch = next(iter(loader.epoch(1)))
        assert batch["clip"].shape == (3, 8, 32, 32, 3)
        assert batch["clip"].dtype == np.uint8
        if task == "class":
            assert batch["label"].shape == (3, 157)
            assert set(np.unique(batch["label"])) <= {0.0, 1.0}
        else:
            assert batch["label"].shape == (3, 64, 157)
            assert batch["mask"].shape == (3, 64)
            np.testing.assert_array_equal(batch["mask"], 1.0)


class TestEvalLoader:
    def test_class_views(self, fake):
        videos, root = _videos(fake, "testing")
        loader = CharadesEvalLoader(
            videos, root, reader=PILReader(), task="class", batch_size=2,
            frames=64, gamma_tau=8, short_side=40, crops=5, num_threads=2)
        batch = next(iter(loader))
        b = batch["clip"].shape[0]
        assert batch["clip"].shape[1:] == (5, 8, 40, 40, 3)
        assert batch["label"].shape == (b, 157)

    def test_loc_padding_bucketed(self, fake):
        videos, root = _videos(fake, "testing")
        loader = CharadesEvalLoader(
            videos, root, reader=PILReader(), task="loc", batch_size=2,
            frames=64, gamma_tau=8, short_side=40, num_threads=2,
            t_pad_multiple=16, tl_pad_multiple=128)
        batch = next(iter(loader))
        assert batch["clip"].shape[1] % 16 == 0
        assert batch["label"].shape[1] % 128 == 0
        assert batch["mask"].shape == batch["label"].shape[:2]
        # mask marks the real frames only
        n_frames = videos[0].n_frames
        assert int(batch["mask"][0].sum()) == n_frames
