"""Charades host input pipelines (classification + localization).

Training: random 160-raw-frame windows at stride 10 -> 16 model frames,
one shared random crop per clip (charades.py:122-148).  Testing reads whole
videos; the classification path slides 10 temporal views (charades.py:
150-157), the localization path pads variable-length clips/labels with a
validity mask (custom_collate_fn, charades.py:167-189).

TPU-specific: padded localization batches round the clip/label lengths up
to fixed multiples so XLA sees a small set of shapes instead of one
compilation per batch.
"""

from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import numpy as np

from x3d_multigrid_tpu.data.charades import (
    CharadesVideo, NUM_CLASSES, frame_path, label_matrix, train_window,
    test_window, test_class_views, pad_collate,
)
from x3d_multigrid_tpu.data.loader import Prefetcher, ShuffledIndexStream


class CharadesTrainLoader:
    """Yields ``clip`` (B, T, C0, C0, 3) uint8, ``flip`` (B,), and task
    labels: class -> ``label`` (B, 157); loc -> ``label`` (B, TL, 157) +
    ``mask`` (B, TL)."""

    def __init__(self, videos: Sequence[CharadesVideo], root: str, *,
                 reader, task: str, batch_size: int, frames: int,
                 gamma_tau: int, short_side: int, crop_size: int,
                 scales, num_threads: int = 8, prefetch: int = 2,
                 seed: int = 0, process_index: int = 0,
                 process_count: int = 1, num_classes: int = NUM_CLASSES):
        self.videos = list(videos)
        self.root = root
        self.reader = reader
        self.task = task
        self.batch_size = batch_size
        self.frames = frames          # already-doubled raw window length
        self.gamma_tau = gamma_tau    # already-doubled stride
        self.short_side = short_side
        self.crop_size = crop_size
        self.scales = scales
        self.num_classes = num_classes
        self.stream = ShuffledIndexStream(len(self.videos), seed)
        self.pool = ThreadPoolExecutor(max_workers=num_threads)
        self.prefetch = prefetch
        self.seed = seed
        self._counter = 0
        # Multi-host DP (parallel/multihost.py): identical index/seed
        # stream on every host, each decodes only its contiguous slice.
        if batch_size % process_count:
            raise ValueError(f"batch {batch_size} not divisible by "
                             f"{process_count} processes")
        self.process_index = process_index
        self.process_count = process_count

    def _load_clip(self, video: CharadesVideo, seed: int):
        rng = np.random.RandomState(seed)
        indices, lab = train_window(video, self.frames, self.gamma_tau, rng,
                                    self.num_classes)
        paths = [frame_path(self.root, video.vid, i) for i in indices]
        clip, params = self.reader.clip_train(
            paths, self.short_side, self.crop_size, self.scales, rng)
        if self.task == "class":
            lab = lab.max(axis=0)  # (TL, C) -> (C,)
        return clip, params.flip, lab

    def _produce(self, num_iterations):
        for _ in range(num_iterations):
            idxs = self.stream.take(self.batch_size)
            seeds = [self.seed + self._counter + i for i in range(len(idxs))]
            self._counter += len(idxs)
            if self.process_count > 1:
                per = self.batch_size // self.process_count
                lo = self.process_index * per
                idxs, seeds = idxs[lo:lo + per], seeds[lo:lo + per]
            futs = [self.pool.submit(self._load_clip, self.videos[j], s)
                    for j, s in zip(idxs, seeds)]
            clips, flips, labels = zip(*(f.result() for f in futs))
            batch = {"clip": np.stack(clips),
                     "flip": np.asarray(flips, bool)}
            if self.task == "class":
                batch["label"] = np.stack(labels)
            else:
                # fixed-length windows: no padding needed in training
                batch["label"] = np.stack(labels)
                batch["mask"] = np.ones(batch["label"].shape[:2], np.float32)
            yield batch

    def epoch(self, num_iterations=None):
        n = num_iterations or max(len(self.videos) // self.batch_size, 1)
        return Prefetcher(self._produce(n), depth=self.prefetch)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class CharadesEvalLoader:
    """Testing batches.

    class task: ``clip`` (B, crops, span, R, R, 3) uint8 + ``label``
    (B, 157) (video-level max).
    loc task: padded ``clip`` (B, Tpad, R, R, 3), ``label`` (B, TLpad, 157),
    ``mask`` (B, TLpad); pads rounded to multiples to bound compilations.
    """

    def __init__(self, videos: Sequence[CharadesVideo], root: str, *,
                 reader, task: str, batch_size: int, frames: int,
                 gamma_tau: int, short_side: int, crops: int = 10,
                 num_threads: int = 8, prefetch: int = 2,
                 t_pad_multiple: int = 16, tl_pad_multiple: int = 128,
                 process_index: int = 0, process_count: int = 1,
                 num_classes: int = NUM_CLASSES):
        self.videos = list(videos)
        self.root = root
        self.reader = reader
        self.task = task
        self.batch_size = batch_size
        self.frames = frames
        self.gamma_tau = gamma_tau
        self.short_side = short_side
        self.crops = crops
        self.pool = ThreadPoolExecutor(max_workers=num_threads)
        self.prefetch = prefetch
        self.t_pad_multiple = t_pad_multiple
        self.tl_pad_multiple = tl_pad_multiple
        self.num_classes = num_classes
        # Multi-host: identical global chunking on every host, each host
        # loads its process_index share; padded shapes are derived from the
        # GLOBAL chunk's metadata so hosts agree without communicating.
        if batch_size % process_count:
            raise ValueError(f"eval batch {batch_size} not divisible by "
                             f"{process_count} processes")
        self.process_index = process_index
        self.process_count = process_count

    def _load_video(self, video: CharadesVideo):
        indices, lab = test_window(video, self.gamma_tau, self.num_classes)
        paths = [frame_path(self.root, video.vid, i) for i in indices]
        clip = self.reader.clip_eval(paths, self.short_side)  # (T, R, R, 3)
        if self.task == "class":
            views = test_class_views(clip.shape[0], self.frames,
                                     self.gamma_tau, self.crops)
            stacked = np.stack([clip[s:s + l] for s, l in views])
            return stacked, lab.max(axis=0)
        return clip, lab

    def _chunk_pads(self, chunk):
        """Padded (t, tl) for a GLOBAL chunk, from metadata only: every
        host computes identical shapes without decoding the others' videos.
        t_model per video = ceil(n_frames / gamma_tau) (test_window);
        label length = n_frames (label_matrix)."""
        t_max = max(-(-v.n_frames // self.gamma_tau) for v in chunk)
        tl_max = max(v.n_frames for v in chunk)
        return (_round_up(t_max, self.t_pad_multiple),
                _round_up(tl_max, self.tl_pad_multiple))

    def _produce(self):
        zero = None  # (clip_row, label_row) template for padded samples
        for start in range(0, len(self.videos), self.batch_size):
            chunk = self.videos[start:start + self.batch_size]
            per = -(-len(chunk) // self.process_count)
            local = chunk[self.process_index * per:
                          (self.process_index + 1) * per]
            futs = [self.pool.submit(self._load_video, v) for v in local]
            loaded = [f.result() for f in futs]
            n_pad = per - len(loaded)
            if self.task == "class":
                if loaded:
                    zero = (np.zeros_like(loaded[0][0]),
                            np.zeros_like(loaded[0][1]))
                elif zero is None:
                    raise RuntimeError("empty first eval chunk; use "
                                       "batch_size >= process_count")
                clips = np.stack([c for c, _ in loaded]
                                 + [zero[0]] * n_pad)
                labels = np.stack([l for _, l in loaded]
                                  + [zero[1]] * n_pad)
                valid = np.asarray([True] * len(loaded) + [False] * n_pad)
                yield {"clip": clips, "label": labels, "valid": valid}
            else:
                # pads derived from GLOBAL chunk metadata -> identical
                # across hosts; zero rows (mask 0) fill the host share
                t_pad, tl_pad = self._chunk_pads(chunk)
                if loaded:
                    clips, labels = zip(*loaded)
                    batch = pad_collate(list(clips), list(labels))
                    spatial = batch["clip"].shape[2:]
                else:
                    batch = {"clip": np.zeros((0, 1, 1, 1, 3), np.uint8),
                             "label": np.zeros((0, 1, self.num_classes),
                                               np.float32),
                             "mask": np.zeros((0, 1), np.float32)}
                    spatial = (self.short_side, self.short_side, 3)
                clip = np.zeros((per, t_pad) + spatial, np.uint8)
                label = np.zeros((per, tl_pad, self.num_classes), np.float32)
                mask = np.zeros((per, tl_pad), np.float32)
                nb = batch["clip"].shape[0]
                clip[:nb, :batch["clip"].shape[1]] = batch["clip"]
                label[:nb, :batch["label"].shape[1]] = batch["label"]
                mask[:nb, :batch["mask"].shape[1]] = batch["mask"]
                valid = np.asarray([True] * nb + [False] * (per - nb))
                yield {"clip": clip, "label": label, "mask": mask,
                       "valid": valid}

    def __iter__(self):
        return iter(Prefetcher(self._produce(), depth=self.prefetch))
