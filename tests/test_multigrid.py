"""Golden replay of the multigrid schedule against the phase table recovered
from the reference training log (BASELINE.md / log_x3d_kinetics_multigrid.txt):

| long_ind | Frames/gamma_tau | BS tuple | W/H tuple | BN splits | LR |
|   0      | 20/10  | (2048, 1024)    | (111, 158)      | 32 | 1.6   |
|   1      | 40/10  | (1024, 512)     | (111, 158)      | 16 | 0.8   |
|   2      | 40/10  | (1024, 512, 256)| (112, 158, 224) | 8  | 0.4   |
|   3      | 80/10  | (512, 256, 128) | (112, 158, 224) | 4  | 0.2   |
|  -1      | 80/10  | (512, 256, 128) | (112, 158, 224) | 4  | 0.002 |

Reference run: base batch 128, init LR 0.2, 120 epochs x 1718 iters/epoch.
"""

import numpy as np
import pytest

from x3d_multigrid_tpu.multigrid import (
    MultigridConfig, MultigridSchedule, enumerate_buckets, long_cycle_shapes,
)

# Reference short-schedule constants (train_x3d_kinetics_multigrid.py:49-67).
ITERS_PER_EPOCH = 220000 // 128  # 1718
CFG = MultigridConfig(
    base_batch_size=128,
    total_iterations=120 * ITERS_PER_EPOCH,
    sample_duration=80,
    crop_size=224,
    gamma_tau=10,
    base_bn_splits=4,
)


def _replay(cfg, epochs, iters_per_epoch):
    sched = MultigridSchedule(cfg)
    plans = []
    for _ in range(epochs):
        plans.extend(sched.epoch(iters_per_epoch))
    return plans


class TestShapes:
    def test_long_cycle_shape_table(self):
        assert long_cycle_shapes(80, 224) == [
            (20, 158), (40, 158), (40, 224), (80, 224)]

    def test_bucket_enumeration(self):
        buckets = {b.bucket_key: b for b in enumerate_buckets(CFG)}
        assert len(buckets) == 10
        # Golden table rows (global BS, frames, crop, bn_splits):
        expected = {
            (2048, 2, 111, 32), (1024, 2, 158, 32),
            (1024, 4, 111, 16), (512, 4, 158, 16),
            (1024, 4, 112, 8), (512, 4, 158, 8), (256, 4, 224, 8),
            (512, 8, 112, 4), (256, 8, 158, 4), (128, 8, 224, 4),
        }
        assert set(buckets) == expected

    def test_budget_roughly_constant(self):
        """B*T*H*W stays within ~25% across buckets (the multigrid
        invariant, README.md:11)."""
        costs = [b.batch_size * b.frames * b.crop ** 2
                 for b in enumerate_buckets(CFG)]
        assert max(costs) / min(costs) < 1.35


class TestGoldenReplay:
    def test_phase_transitions_match_log(self):
        """First epooch-0 transition and the long-cycle sequence of phase 1
        must match the logged run: long 0 -> 1 -> 2 -> 3 at quarter points
        of [0, 0.4N), then cycling again in later phases, and -1 after
        0.925N."""
        n = CFG.total_iterations
        plans = _replay(CFG, 120, ITERS_PER_EPOCH)
        assert len(plans) == n

        # long index per iteration
        li = np.array([p.long_cycle_index for p in plans])
        # Phase 1 = [0, 0.4N): four equal chunks 0,1,2,3
        p1 = int(0.4 * n)
        chunk = p1 / 4
        for k in range(4):
            mid = int(chunk * k + chunk / 2)
            assert li[mid] == k, (k, mid, li[mid])
        # Final phase (after (0.85+1)/2=0.925 halving) runs -1
        assert li[int(0.93 * n)] == -1
        assert li[-1] == -1

    def test_first_transition_stats_match_log_line15(self):
        """Log line 15: 'Frames 20/10, BS (2048,1024), W/H (111,158),
        BN_splits 32, LR 1.6' with init LR 0.2."""
        sched = MultigridSchedule(CFG)
        plans = list(sched.epoch(4))
        p0, p1 = plans[0], plans[1]
        assert p0.long_cycle_index == 0
        assert p0.raw_frames == 20 and p0.frames == 2
        assert (p0.batch_size, p1.batch_size) == (2048, 1024)
        assert (p0.crop, p1.crop) == (111, 158)
        assert p0.bn_splits == 32
        assert p0.lr_scale == 8.0  # 0.2 * 8 = 1.6 (log LR)
        assert p1.lr_scale is None

    def test_transition_lr_scales(self):
        """Entering long 1/2/3 scales LR by 0.5 each (log: 1.6 -> .8 -> .4
        -> .2); entering the final phase applies long_cycle[-1] == 1."""
        plans = _replay(CFG, 120, ITERS_PER_EPOCH)
        scales = [(p.long_cycle_index, p.lr_scale) for p in plans
                  if p.lr_scale is not None]
        assert scales[0] == (0, 8.0)
        assert scales[1] == (1, 0.5)
        assert scales[2] == (2, 0.5)
        assert scales[3] == (3, 0.5)
        # first final-phase entry
        final = next(s for s in scales if s[0] == -1)
        assert final == (-1, 1.0)

    def test_bn_splits_per_long_cycle(self):
        plans = _replay(CFG, 120, ITERS_PER_EPOCH)
        by_li = {}
        for p in plans:
            by_li.setdefault(p.long_cycle_index, set()).add(p.bn_splits)
        assert by_li[0] == {32}
        assert by_li[1] == {16}
        assert by_li[2] == {8}
        assert by_li[3] == {4}
        assert by_li[-1] == {4}

    def test_every_plan_maps_to_a_bucket(self):
        buckets = {b.bucket_key for b in enumerate_buckets(CFG)}
        plans = _replay(CFG, 120, ITERS_PER_EPOCH)
        assert {p.bucket_key for p in plans} <= buckets

    def test_batch_divisible_by_splits_and_const_bn_size(self):
        """Per-chip batch = CONST_BN_SIZE * splits * short_mult: every
        bucket batch must divide evenly into splits groups of >= 8 on a
        4-way data-parallel mesh (reference GPU count)."""
        for b in enumerate_buckets(CFG):
            per_chip = b.batch_size // 4
            assert per_chip % b.bn_splits == 0
            assert per_chip // b.bn_splits in (8, 16, 32)

    def test_resume_mid_schedule(self):
        """Reconstructing at cur_iterations reproduces the same tail
        (cycle_batch_sampler.py:43's resume contract)."""
        full = _replay(CFG, 120, ITERS_PER_EPOCH)
        resume_at = 60 * ITERS_PER_EPOCH
        sched = MultigridSchedule(CFG, cur_iterations=resume_at)
        sched.last_long = full[resume_at - 1].long_cycle_index
        resumed = []
        for _ in range(60):
            resumed.extend(sched.epoch(ITERS_PER_EPOCH))
        tail = full[resume_at:]
        for a, b in zip(resumed, tail):
            assert a.bucket_key == b.bucket_key
            assert a.long_cycle_index == b.long_cycle_index
