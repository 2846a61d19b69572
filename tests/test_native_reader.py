"""Native C++ decoder vs PIL reader cross-validation.

Skipped when csrc/build/libx3djpeg.so hasn't been built
(``make -C csrc``)."""

import os

import numpy as np
import pytest

from x3d_multigrid_tpu.data.reader import PILReader
from x3d_multigrid_tpu.data.synthetic import make_fake_kinetics

native = pytest.importorskip(
    "x3d_multigrid_tpu.data.native",
    reason="native reader unavailable")

try:
    NATIVE = native.NativeReader(fast=False)   # PIL-equivalent mode
    NATIVE_FAST = native.NativeReader(fast=True)
except FileNotFoundError:
    NATIVE = None

pytestmark = pytest.mark.skipif(NATIVE is None,
                                reason="libx3djpeg.so not built")


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nkin"))
    make_fake_kinetics(root, n_classes=1, videos_per_class=1, n_frames=4,
                       frame_size=(96, 64))
    vdir = os.path.join(root, "class_0", "vid0_0_000000_000010")
    return [os.path.join(vdir, f"frame_{i:05d}.jpg") for i in range(1, 5)]


class TestNativeVsPIL:
    def test_probe_matches_pil_dims(self, frames):
        w, h = NATIVE._probe(frames[0], 48)
        img = PILReader()._decode(frames[0], 48)
        assert (w, h) == img.size

    def test_eval_decode_close_to_pil(self, frames):
        pil = PILReader().clip_eval(frames, 48)
        nat = NATIVE.clip_eval(frames, 48)
        assert nat.shape == pil.shape == (4, 48, 48, 3)
        diff = np.abs(nat.astype(int) - pil.astype(int))
        # same decode path up to resampling rounding; allow small deltas
        assert diff.mean() < 4.0, diff.mean()
        assert (diff <= 16).mean() > 0.99

    def test_train_decode_same_crop_params_and_pixels(self, frames):
        rng1 = np.random.RandomState(7)
        rng2 = np.random.RandomState(7)
        pil, p_pil = PILReader().clip_train(frames, 48, 32, (0.875,), rng1)
        nat, p_nat = NATIVE.clip_train(frames, 48, 32, (0.875,), rng2)
        assert p_pil == p_nat  # identical param sampling from same seed
        assert nat.shape == pil.shape == (4, 32, 32, 3)
        diff = np.abs(nat.astype(int) - pil.astype(int))
        assert diff.mean() < 4.0, diff.mean()

    def test_native_upscale_path(self, frames):
        # out_size larger than crop side exercises the upscale branch
        rng = np.random.RandomState(3)
        nat, _ = NATIVE.clip_train(frames, 48, 64, (0.875,), rng)
        assert nat.shape == (4, 64, 64, 3)
        assert nat.std() > 0

    def test_fast_dct_mode_roughly_agrees(self, frames):
        """DCT-scaled decode is a different lowpass; on worst-case noise
        JPEGs it should still track the exact path loosely."""
        exact = NATIVE.clip_eval(frames, 48)
        fast = NATIVE_FAST.clip_eval(frames, 48)
        assert fast.shape == exact.shape
        corr = np.corrcoef(exact.astype(float).ravel(),
                           fast.astype(float).ravel())[0, 1]
        assert corr > 0.8, corr
