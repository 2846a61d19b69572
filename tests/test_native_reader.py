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

    def test_batch_clip_entry_bit_identical_to_per_frame(self, frames):
        """x3d_decode_clip (native IO + frame-parallel loop) must produce
        exactly the per-frame ctypes path's bytes."""
        rng = np.random.RandomState(11)
        w, h = NATIVE._probe(frames[0], 48)
        from x3d_multigrid_tpu.data.spatial import sample_train_crop_params
        params = sample_train_crop_params(w, h, (0.875,), rng)
        crop = (params.x1, params.y1, params.side)
        per_frame = np.stack([
            NATIVE._decode(p, 48, crop, 32) for p in frames])
        for threads in (1, 3):
            rdr = native.NativeReader(fast=False, frame_threads=threads)
            assert rdr._has_clip
            batch = rdr._decode_clip(frames, 48, crop, 32)
            np.testing.assert_array_equal(batch, per_frame)
        # eval path too (centered crop, decode-size output)
        per_frame_eval = np.stack([
            NATIVE._decode(p, 48, (-1, -1, -1), 48) for p in frames])
        batch_eval = native.NativeReader(
            fast=False, frame_threads=2).clip_eval(frames, 48)
        np.testing.assert_array_equal(batch_eval, per_frame_eval)

    def test_batch_clip_error_names_failing_frame(self, frames, tmp_path):
        bad = str(tmp_path / "corrupt.jpg")
        with open(bad, "wb") as f:
            f.write(b"\xff\xd8 this is not a jpeg")
        rdr = native.NativeReader(fast=False, frame_threads=2)
        with pytest.raises(IOError, match="frame 2"):
            rdr._decode_clip([frames[0], frames[1], bad, frames[3]],
                             48, (-1, -1, -1), 48)
        missing = str(tmp_path / "missing.jpg")
        with pytest.raises(IOError, match="frame 0"):
            rdr._decode_clip([missing], 48, (-1, -1, -1), 48)

    def test_fast_dct_mode_roughly_agrees(self, frames):
        """DCT-scaled decode is a different lowpass; on worst-case noise
        JPEGs it should still track the exact path loosely."""
        exact = NATIVE.clip_eval(frames, 48)
        fast = NATIVE_FAST.clip_eval(frames, 48)
        assert fast.shape == exact.shape
        corr = np.corrcoef(exact.astype(float).ravel(),
                           fast.astype(float).ravel())[0, 1]
        assert corr > 0.8, corr
