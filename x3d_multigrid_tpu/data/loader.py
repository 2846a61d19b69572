"""Host input pipeline: sampling, decode fan-out, batch assembly, prefetch.

TPU-native replacement for the reference's forked multiprocess DataLoader
(dataloader.py/worker.py): instead of 12 worker processes feeding per-index
queues, a thread pool decodes clips (JPEG decode releases the GIL in both
PIL and the native C++ reader) and a background producer keeps a small
queue of ready uint8 numpy batches that the train loop overlaps with device
steps.  The multigrid iteration index no longer needs to be smuggled
through ``Dataset.__getitem__`` (worker.py:178) — the
:class:`~x3d_multigrid_tpu.multigrid.schedule.MultigridSchedule` plan *is*
the batch spec.
"""

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

from x3d_multigrid_tpu.data.kinetics import VideoSample, frame_path
from x3d_multigrid_tpu.data.temporal import (
    temporal_random_crop, sample_t_stride, eval_temporal_views,
)
from x3d_multigrid_tpu.multigrid.schedule import (
    MultigridSchedule, IterationPlan,
)

# -- multi-process decode --------------------------------------------------
# JPEG decode releases the GIL in both PIL and the native C++ reader, so
# the default thread pool scales to physical cores.  When one process
# still cannot feed its chips (pod-scale coarse buckets), the loaders can
# run the same decode fan-out over worker PROCESSES: each worker holds its
# own reader (created once by the pool initializer), tasks are picklable
# (sample metadata + plan + seed), and results stream back as numpy
# arrays.  Output is bit-identical to thread mode (same per-clip seeds).

_PROC_READER = None


def _reader_spec(reader):
    """Picklable (kind, kwargs) so worker processes reconstruct the
    parent's reader WITH its configuration (fast/frame_threads) — not just
    its family.  Returns None for unknown custom reader types, which the
    loader rejects for executor='process' rather than silently swapping
    the decoder."""
    name = type(reader).__name__
    if name == "PILReader":
        return ("pil", {})
    if name == "NativeReader":
        return ("native", {"fast": bool(getattr(reader, "_fast", 1)),
                           "frame_threads": int(getattr(
                               reader, "_frame_threads", 1))})
    return None


def _proc_reader_init(spec=("native", {})):
    """Build this worker process's reader — the SAME decoder with the
    SAME configuration as the parent's (JPEG decoders differ by a few
    LSBs in IDCT/scaling, so mixing them would break thread-vs-process
    bit-exactness)."""
    global _PROC_READER
    kind, kwargs = spec
    if kind == "pil":
        from x3d_multigrid_tpu.data.reader import PILReader
        _PROC_READER = PILReader()
    else:
        from x3d_multigrid_tpu.data.native import NativeReader
        _PROC_READER = NativeReader(**kwargs)


def _decode_train_clip(reader, sample: VideoSample, plan: IterationPlan,
                       seed: int, *, sample_duration: int, gamma_tau: int,
                       short: int, out: int, scales, out_arr=None):
    """Pure decode task shared by the thread and process pools.
    ``out_arr`` (thread pool only — processes can't share it) is this
    clip's slice of the preallocated batch buffer: decode writes the
    final staging bytes directly, no assembly copy."""
    rng = np.random.RandomState(seed)
    t_stride = sample_t_stride(sample_duration, plan.raw_frames, rng)
    all_indices = list(range(1, sample.n_frames + 1))
    idx = temporal_random_crop(all_indices, sample_duration, gamma_tau,
                               t_stride, plan.raw_frames, rng)
    paths = [frame_path(sample.video, i) for i in idx]
    frames, params = reader.clip_train(paths, short, out, scales, rng,
                                       out=out_arr)
    return frames, params.flip, sample.label


def _decode_train_clip_proc(sample, plan, seed, **kw):
    return _decode_train_clip(_PROC_READER, sample, plan, seed, **kw)


class ShuffledIndexStream:
    """Infinite shuffled index stream (RandomEpochSampler semantics,
    cycle_batch_sampler.py:4-25): re-permutes every pass."""

    def __init__(self, n: int, seed: int = 0):
        self.n = n
        self.rng = np.random.RandomState(seed)
        self._iter = self._gen()

    def _gen(self):
        while True:
            for i in self.rng.permutation(self.n):
                yield int(i)

    def take(self, k: int) -> List[int]:
        return [next(self._iter) for _ in range(k)]


class Prefetcher:
    """Runs ``producer`` (a generator) in a background thread, buffering up
    to ``depth`` items."""

    _DONE = object()

    def __init__(self, producer: Iterator, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None

        def run():
            try:
                for item in producer:
                    self.q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self.q.put(self._DONE)

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class KineticsTrainLoader:
    """Multigrid training batches from a Kinetics frame-folder index.

    Yields dicts: ``clip`` uint8, ``flip`` (B,) bool, ``label`` (B,) int32,
    ``plan`` IterationPlan.  Flip + normalize (+ any residual resize) run
    on device in the train step (ops/preprocess).

    ``adaptive_decode`` (default True) scales the whole decode geometry to
    the bucket's short-cycle crop: frames are decoded at short side
    ``short_side * crop / crop_size`` and cropped straight to
    ``(plan.crop, plan.crop)`` — libjpeg's DCT scaling makes the smaller
    decode nearly free, and host decode, host->device transfer, and the
    device resize all shrink by up to (crop_size/crop)^2 (4x at the
    coarsest multigrid buckets, where the reference's input pipeline
    struggles most — SURVEY §7).  With False the loader always emits
    ``(B, T, crop_size, crop_size, 3)`` and the device resizes.
    """

    def __init__(self, samples: Sequence[VideoSample], schedule:
                 MultigridSchedule, *, reader, short_side: int,
                 crop_size: int, scales, gamma_tau: int,
                 num_threads: int = 8, prefetch: int = 2, seed: int = 0,
                 adaptive_decode: bool = True, pipeline_batches: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 executor: str = "thread"):
        self.samples = list(samples)
        self.schedule = schedule
        self.reader = reader
        self.short_side = short_side
        self.crop_size = crop_size
        self.scales = scales
        self.gamma_tau = gamma_tau
        self.stream = ShuffledIndexStream(len(self.samples), seed)
        if executor == "process":
            # see _proc_reader_init: decode in worker processes when one
            # process's thread pool can't feed the chips (GIL-free decode
            # normally makes threads enough; this is the pod-scale escape
            # hatch measured in tools/bench_loader.py)
            spec = _reader_spec(reader)
            if spec is None:
                raise ValueError(
                    f"executor='process' cannot reconstruct a "
                    f"{type(reader).__name__} in worker processes; use "
                    f"PILReader/NativeReader or executor='thread'")
            self.pool = ProcessPoolExecutor(
                max_workers=num_threads, initializer=_proc_reader_init,
                initargs=(spec,))
        elif executor == "thread":
            self.pool = ThreadPoolExecutor(max_workers=num_threads)
        else:
            raise ValueError(f"executor must be thread|process: {executor}")
        self.executor = executor
        self.prefetch = prefetch
        self.seed = seed
        self.adaptive_decode = adaptive_decode
        self.pipeline_batches = max(1, pipeline_batches)
        self._clip_counter = 0
        # Multi-host DP (parallel/multihost.py): every host draws the
        # IDENTICAL index/seed stream (same seed), then decodes only its
        # contiguous slice of each global batch — the assembled global
        # array is bit-identical to a single-host run's.
        self.process_index = process_index
        self.process_count = process_count

    def _geometry(self, plan: IterationPlan):
        if not self.adaptive_decode or plan.crop == self.crop_size:
            return self.short_side, self.crop_size
        short = max(1, int(round(self.short_side * plan.crop
                                 / self.crop_size)))
        return short, plan.crop

    def _load_clip(self, sample: VideoSample, plan: IterationPlan,
                   seed: int, out_arr=None):
        short, out = self._geometry(plan)
        return _decode_train_clip(
            self.reader, sample, plan, seed,
            sample_duration=self.schedule.cfg.sample_duration,
            gamma_tau=self.gamma_tau, short=short, out=out,
            scales=self.scales, out_arr=out_arr)

    def _submit(self, plan: IterationPlan):
        indices = self.stream.take(plan.batch_size)
        seeds = [self.seed + self._clip_counter + i
                 for i in range(len(indices))]
        self._clip_counter += len(indices)
        if self.process_count > 1:
            if plan.batch_size % self.process_count:
                raise ValueError(
                    f"batch {plan.batch_size} not divisible by "
                    f"{self.process_count} processes")
            per = plan.batch_size // self.process_count
            lo = self.process_index * per
            indices, seeds = indices[lo:lo + per], seeds[lo:lo + per]
        if self.executor == "process":
            short, out = self._geometry(plan)
            futures = [
                self.pool.submit(
                    _decode_train_clip_proc, self.samples[j], plan, s,
                    sample_duration=self.schedule.cfg.sample_duration,
                    gamma_tau=self.gamma_tau, short=short, out=out,
                    scales=self.scales)
                for j, s in zip(indices, seeds)]
            return plan, futures, None
        # thread pool: decode straight into the batch staging buffer
        # (disjoint per-clip slices), skipping the np.stack assembly copy
        _, out = self._geometry(plan)
        batch_arr = np.empty(
            (len(indices), plan.frames, out, out, 3), np.uint8)
        futures = [
            self.pool.submit(self._load_clip, self.samples[j], plan, s,
                             out_arr=batch_arr[i])
            for i, (j, s) in enumerate(zip(indices, seeds))]
        return plan, futures, batch_arr

    def _produce(self, num_iterations: int):
        # Submit decode work `pipeline_batches` iterations ahead so one slow
        # decode stalls only its own batch's *assembly*, not the pool: the
        # threads keep draining later batches' futures in the meantime
        # (replaces the reference's 2*num_workers task prefetch,
        # dataloader.py:745-747).
        import collections
        plans = iter(self.schedule.epoch(num_iterations))
        pending: "collections.deque" = collections.deque()
        for plan in plans:
            pending.append(self._submit(plan))
            if len(pending) >= self.pipeline_batches:
                break
        while pending:
            plan, futures, batch_arr = pending.popleft()
            nxt = next(plans, None)
            if nxt is not None:
                pending.append(self._submit(nxt))
            clips, flips, labels = zip(*(f.result() for f in futures))
            yield {
                "clip": batch_arr if batch_arr is not None
                else np.stack(clips),
                "flip": np.asarray(flips, bool),
                "label": np.asarray(labels, np.int32),
                "plan": plan,
            }

    def epoch(self, num_iterations: int):
        return Prefetcher(self._produce(num_iterations),
                          depth=self.prefetch)

    def close(self):
        """Release decode threads (graceful shutdown; the reference's
        multi-process loader needs an elaborate protocol for this,
        dataloader.py:395-671 — a thread pool just drains)."""
        self.pool.shutdown(wait=False, cancel_futures=True)


class KineticsEvalLoader:
    """Multi-view validation batches (kinetics.py:205-239): yields
    ``clip`` (B, n_views, T, R, R, 3) uint8 center-crops, ``label`` (B,)
    and ``valid`` (B,) bool.

    Multi-host DP: every host walks the identical global chunking of the
    sample list and loads only its contiguous ``process_index`` share of
    each chunk, so ``global_batch_from_local`` reassembles exactly the
    single-host batch.  Ragged final chunks are zero-padded (``valid``
    False) to keep per-host shares equal — metric code must mask, not
    truncate."""

    def __init__(self, samples: Sequence[VideoSample], *, reader,
                 short_side: int, gamma_tau: int, frames: int,
                 crops: int = 3, batch_size: int = 16,
                 num_threads: int = 8, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        self.samples = list(samples)
        self.reader = reader
        self.short_side = short_side
        self.gamma_tau = gamma_tau
        self.frames = frames
        self.crops = crops
        self.batch_size = batch_size
        self.pool = ThreadPoolExecutor(max_workers=num_threads)
        self.prefetch = prefetch
        if batch_size % process_count:
            raise ValueError(f"eval batch {batch_size} not divisible by "
                             f"{process_count} processes")
        self.process_index = process_index
        self.process_count = process_count

    def _load_views(self, sample: VideoSample):
        views = eval_temporal_views(sample.n_frames, self.gamma_tau,
                                    self.frames, self.crops)
        # decode the union of needed frames once
        needed = sorted({i for v in views for i in v})
        paths = [frame_path(sample.video, i) for i in needed]
        decoded = self.reader.clip_eval(paths, self.short_side)
        by_index = {i: decoded[k] for k, i in enumerate(needed)}
        clips = np.stack([np.stack([by_index[i] for i in v]) for v in views])
        return clips, sample.label

    def _produce(self):
        zero_clip = None
        for start in range(0, len(self.samples), self.batch_size):
            chunk = self.samples[start:start + self.batch_size]
            # equal per-host share; the final ragged chunk zero-pads
            per = -(-len(chunk) // self.process_count)
            local = chunk[self.process_index * per:
                          (self.process_index + 1) * per]
            futures = [self.pool.submit(self._load_views, s) for s in local]
            loaded = [f.result() for f in futures]
            if loaded:
                zero_clip = np.zeros_like(loaded[0][0])
            elif zero_clip is None:
                raise RuntimeError(
                    "empty first eval chunk on this host; use a batch_size "
                    ">= process_count")
            n_pad = per - len(loaded)
            clips = np.stack([c for c, _ in loaded]
                             + [zero_clip] * n_pad)
            labels = np.asarray([l for _, l in loaded]
                                + [-1] * n_pad, np.int32)
            valid = np.asarray([True] * len(loaded) + [False] * n_pad)
            yield {"clip": clips, "label": labels, "valid": valid}

    def __iter__(self):
        return iter(Prefetcher(self._produce(), depth=self.prefetch))

    def close(self):
        self.pool.shutdown(wait=False, cancel_futures=True)
