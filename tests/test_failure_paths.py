"""Failure-detection parity (SURVEY §5.3): decode-worker exceptions must
surface in the training loop, not vanish in background threads (the
reference inherits torch's ExceptionWrapper re-raise, worker.py:188-193)."""

import numpy as np
import pytest

from x3d_multigrid_tpu.data.loader import (
    Prefetcher, KineticsTrainLoader, ShuffledIndexStream,
)
from x3d_multigrid_tpu.data.kinetics import VideoSample
from x3d_multigrid_tpu.data.reader import PILReader
from x3d_multigrid_tpu.multigrid import MultigridConfig, MultigridSchedule


class TestPrefetcher:
    def test_propagates_producer_exception(self):
        def boom():
            yield 1
            raise RuntimeError("decode failed")

        pf = Prefetcher(boom(), depth=2)
        assert next(iter(pf)) == 1
        with pytest.raises(RuntimeError, match="decode failed"):
            list(pf)

    def test_clean_exhaustion(self):
        pf = Prefetcher(iter(range(3)), depth=1)
        assert list(pf) == [0, 1, 2]


class TestLoaderFailure:
    def test_missing_frames_raise_in_main_thread(self, tmp_path):
        """A dataset entry pointing at a nonexistent folder must raise in
        the consumer (via the thread pool future), not hang."""
        samples = [VideoSample(video=str(tmp_path / "missing"),
                               n_frames=90, label=0, video_id="x")]
        cfg = MultigridConfig(base_batch_size=1, total_iterations=16,
                              sample_duration=80, crop_size=32,
                              gamma_tau=10, base_bn_splits=1)
        loader = KineticsTrainLoader(
            samples, MultigridSchedule(cfg), reader=PILReader(),
            short_side=40, crop_size=32, scales=(0.875,), gamma_tau=10,
            num_threads=2)
        with pytest.raises(Exception):
            next(iter(loader.epoch(1)))


class TestIndexStream:
    def test_deterministic_given_seed(self):
        a = ShuffledIndexStream(20, seed=3).take(40)
        b = ShuffledIndexStream(20, seed=3).take(40)
        assert a == b


class TestProcessExecutorReaderSpec:
    """executor='process' must rebuild the parent's reader CONFIG in the
    workers, not just its family (thread-vs-process bit-exactness)."""

    def test_spec_preserves_native_config(self):
        from x3d_multigrid_tpu.data.loader import _reader_spec
        from x3d_multigrid_tpu.data.reader import PILReader
        assert _reader_spec(PILReader()) == ("pil", {})
        try:
            from x3d_multigrid_tpu.data.native import NativeReader
        except Exception:
            return  # native lib not built in this env
        kind, kw = _reader_spec(NativeReader(fast=False, frame_threads=3))
        assert kind == "native"
        assert kw == {"fast": False, "frame_threads": 3}

    def test_custom_reader_rejected_for_process_executor(self, tmp_path):
        from x3d_multigrid_tpu.data.loader import KineticsTrainLoader
        from x3d_multigrid_tpu.multigrid import (MultigridConfig,
                                                 MultigridSchedule)

        class WeirdReader:
            pass

        cfg = MultigridConfig(base_batch_size=8, total_iterations=16,
                              sample_duration=8, crop_size=32)
        with pytest.raises(ValueError, match="WeirdReader"):
            KineticsTrainLoader(
                [], MultigridSchedule(cfg), reader=WeirdReader(),
                short_side=40, crop_size=32, scales=(1.0,), gamma_tau=2,
                executor="process")
