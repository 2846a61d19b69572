"""The multigrid long/short-cycle schedule as a pure-Python engine.

The reference implements the schedule inside a torch ``BatchSampler``
(cycle_batch_sampler.py:28-113) plus per-sample shape derivation inside the
dataset (kinetics_multigrid.py:205-237).  On TPU the schedule instead drives
a *finite set of pre-compiled shape buckets*: each iteration the engine emits
an :class:`IterationPlan` — ``(long_cycle_index, short_state, batch_size,
frames, crop, bn_splits, lr events)`` — and the trainer dispatches the
matching pre-jitted train step.  Nothing here touches device code; it is the
single source of truth for "what shape is iteration *i*".

Semantics replicated exactly (verified by golden tests against the phase
table recovered from the reference training log — BASELINE.md):

- LR phases split the run at ``[0, .4, .65, .925, 1] * total_iters`` (the
  ``schedule[-2]`` halving of train_x3d_kinetics_multigrid.py:101 happens
  *before* the sampler consumes the list — it mutates the shared list).
- Each non-final phase is divided into ``len(long_cycle)`` equal chunks,
  one per long-cycle index; the final phase runs with index -1 (no cycling)
  (cycle_batch_sampler.py:76-95).
- Long cycle scales the batch by ``[8, 4, 2, 1]`` and sets
  ``(T, crop)`` = ``[(T/4, S/sqrt2), (T/2, S/sqrt2), (T/2, S), (T, S)]``
  (kinetics_multigrid.py:205-209); index -1 selects the last entry.
- Short cycles modulate batch and crop per iteration: for long index 0/1 a
  2-cycle ``x2 / x1`` (crop ``S/sqrt2`` on even iterations); otherwise a
  3-cycle ``x4 / x2 / x1`` (crop ``S/2``, ``S/sqrt2``, ``S``)
  (cycle_batch_sampler.py:98-113, kinetics_multigrid.py:228-237).
- BN split count = ``base_bn_splits * long_cycle[long_index]``
  (train_x3d_kinetics_multigrid.py:228).
- LR is scaled at long-cycle transitions by ``long_cycle_lr_scale`` —
  or by ``long_cycle[long_index]`` when (re)starting / entering the final
  phase (train_x3d_kinetics_multigrid.py:227-234).
"""

import dataclasses
import math
from typing import Iterator, List, Optional, Sequence, Tuple


def long_cycle_shapes(sample_duration: int, crop_size: int
                      ) -> List[Tuple[int, int]]:
    """(raw frames, crop) per long-cycle index (kinetics_multigrid.py:205-209)."""
    return [
        (sample_duration // 4, int(math.floor(crop_size / math.sqrt(2)))),
        (sample_duration // 2, int(math.floor(crop_size / math.sqrt(2)))),
        (sample_duration // 2, crop_size),
        (sample_duration, crop_size),
    ]


def short_cycle_crop(long_index: int, iteration: int, crop: int
                     ) -> Tuple[int, int]:
    """Per-iteration short-cycle crop shrink (kinetics_multigrid.py:228-237).

    Returns ``(short_state, crop)``.  ``iteration`` is the batch index
    within the epoch iterator (the counter the forked worker threads into
    ``__getitem__`` — worker.py:178).
    """
    if long_index in (0, 1):
        state = iteration % 2
        if state == 0:
            crop = int(math.floor(crop / math.sqrt(2)))
    else:
        state = iteration % 3
        if state == 0:
            crop = crop // 2
        elif state == 1:
            crop = int(math.floor(crop / math.sqrt(2)))
    return state, crop


def _short_batch_multiplier(long_index: int, short_counter: int) -> int:
    """cycle_batch_sampler.py:98-113."""
    if long_index in (0, 1):
        return 2 if short_counter % 2 == 0 else 1
    return {0: 4, 1: 2, 2: 1}[short_counter % 3]


@dataclasses.dataclass(frozen=True)
class MultigridConfig:
    base_batch_size: int = 128          # BS * BS_UPSCALE
    total_iterations: int = 206250      # epochs * iterations_per_epoch
    phase_fractions: Sequence[float] = (0.0, 0.4, 0.65, 0.85, 1.0)
    long_cycle: Sequence[int] = (8, 4, 2, 1)
    long_cycle_lr_scale: Sequence[float] = (8, 0.5, 0.5, 0.5)
    sample_duration: int = 80           # raw frames per clip
    crop_size: int = 224
    gamma_tau: int = 10
    base_bn_splits: int = 4             # BASE_BS_PER_GPU // CONST_BN_SIZE

    @property
    def schedule(self) -> List[int]:
        """Iteration boundaries with the last-phase halving applied
        (train_x3d_kinetics_multigrid.py:67,101)."""
        s = [int(f * self.total_iterations) for f in self.phase_fractions]
        s[-2] = (s[-2] + s[-1]) // 2
        return s

    @property
    def lr_milestones(self) -> List[int]:
        """MultiStepLR milestones = schedule[1:] (x0.1 at each)."""
        return self.schedule[1:]


@dataclasses.dataclass(frozen=True)
class IterationPlan:
    iteration: int          # global iteration counter (persists across epochs)
    epoch_iteration: int    # batch index within the epoch iterator
    long_cycle_index: int   # 0..3, or -1 in the final phase
    short_state: int
    batch_size: int         # global clips this iteration
    frames: int             # model-time frames (raw // gamma_tau)
    raw_frames: int         # frames sampled from disk
    crop: int               # spatial crop after short-cycle shrink
    bn_splits: int          # per-replica SubBN split count
    lr_scale: Optional[float]  # multiply LR by this *before* the step, or None

    @property
    def bucket_key(self) -> Tuple[int, int, int, int]:
        """(batch, frames, crop, bn_splits) — the pjit bucket key.

        bn_splits is part of the key: the same (B, T, crop) occurs with
        different split counts (e.g. 512x4fx158 in long cycles 1 and 2),
        and the split count is a static reshape constant in the compiled
        step.
        """
        return (self.batch_size, self.frames, self.crop, self.bn_splits)


class MultigridSchedule:
    """Stateful engine replicating ``CycleBatchSampler`` phase arithmetic.

    Use :meth:`epoch` to get one epoch's worth of :class:`IterationPlan`;
    internal long-cycle state persists across epochs while the short-cycle
    counter resets with each iterator (cycle_batch_sampler.py:52-58).
    Checkpoint/resume = reconstruct with ``cur_iterations`` (the reference's
    resume path, cycle_batch_sampler.py:43).
    """

    def __init__(self, cfg: MultigridConfig, cur_iterations: int = 0):
        self.cfg = cfg
        self.schedule = cfg.schedule
        self.long_cycle = list(cfg.long_cycle)
        self.iteration_counter = cur_iterations
        self.short_iteration_counter = 0
        self.phase = 1
        self.phase_steps = (self.schedule[1] - self.schedule[0]) / len(
            self.long_cycle)
        self.long_cycle_index = 0
        self.iter_offset = 0.0
        self.last_long = -2  # sentinel: "no previous long index" (:125)
        self._shapes = long_cycle_shapes(cfg.sample_duration, cfg.crop_size)

    # -- CycleBatchSampler.adjust_long_cycle (cycle_batch_sampler.py:76-95) --
    def _adjust_long_cycle(self) -> None:
        if self.iteration_counter > self.schedule[self.phase]:
            if self.phase >= len(self.schedule) - 1:
                # past the schedule's end (e.g. a trailing partial epoch):
                # stay in the final no-cycling phase instead of the
                # reference's implicit hard stop at the sampler's length
                self.long_cycle_index = -1
                return
            self.iter_offset = self.schedule[self.phase]
            self.phase += 1
            self.phase_steps = (self.schedule[self.phase]
                                - self.schedule[self.phase - 1]) / len(
                                    self.long_cycle)
            self.long_cycle_index = 0
            if self.phase == len(self.schedule) - 1:
                self.long_cycle_index = -1
        elif self.iteration_counter >= self.phase_steps + self.iter_offset:
            self.iter_offset += self.phase_steps
            self.long_cycle_index += 1
            if self.phase == len(self.schedule) - 1:
                self.long_cycle_index = -1
            self.long_cycle_index = min(self.long_cycle_index,
                                        len(self.long_cycle) - 1)

    def _plan(self, epoch_iteration: int) -> IterationPlan:
        li = self.long_cycle_index
        raw_frames, crop = self._shapes[li]  # li=-1 -> last entry, as in ref
        short_state, crop = short_cycle_crop(li, epoch_iteration, crop)
        mult = _short_batch_multiplier(li, self.short_iteration_counter)
        batch = self.cfg.base_batch_size * self.long_cycle[li] * mult

        lr_scale = None
        if li != self.last_long:
            # train_x3d_kinetics_multigrid.py:229: full long-cycle factor on
            # a fresh start or when entering the final phase, else the
            # per-transition scale.
            if self.last_long == -2 or li == -1:
                lr_scale = float(self.long_cycle[li])
            else:
                lr_scale = float(self.cfg.long_cycle_lr_scale[li])
            self.last_long = li

        return IterationPlan(
            iteration=self.iteration_counter,
            epoch_iteration=epoch_iteration,
            long_cycle_index=li,
            short_state=short_state,
            batch_size=batch,
            frames=raw_frames // self.cfg.gamma_tau,
            raw_frames=raw_frames,
            crop=crop,
            bn_splits=self.cfg.base_bn_splits * self.long_cycle[li],
            lr_scale=lr_scale,
        )

    def epoch(self, num_iterations: int) -> Iterator[IterationPlan]:
        """One epoch iterator (mirrors CycleBatchSampler.__iter__: short
        counter reset + 5 warm-up long-cycle adjustments)."""
        self.short_iteration_counter = 0
        for _ in range(5):
            self._adjust_long_cycle()
        for i in range(num_iterations):
            yield self._plan(i)
            self.iteration_counter += 1
            self.short_iteration_counter += 1
            self._adjust_long_cycle()

    def state_dict(self) -> dict:
        return {"iteration_counter": self.iteration_counter,
                "last_long": self.last_long}

    @classmethod
    def from_state(cls, cfg: MultigridConfig, state: dict
                   ) -> "MultigridSchedule":
        sched = cls(cfg, cur_iterations=state["iteration_counter"])
        sched.last_long = state.get("last_long", -2)
        return sched
