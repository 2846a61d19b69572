"""Full-integration convergence test: the real run() loop (JPEG decode ->
prefetching loader -> multigrid schedule -> DP train step -> SubBN
aggregation -> 3-view val -> checkpoint) on a tiny class-color-coded
synthetic dataset.  The model must beat chance on validation within a few
epochs — the closest CPU-runnable analog of the reference's only
verification method (its committed training log, SURVEY §4)."""

import json
import os

import numpy as np
import pytest

from x3d_multigrid_tpu.data.synthetic import make_fake_kinetics
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KineticsRecipe, run,
)

TINY_MODEL = dict(
    blocks_override=(1, 1, 1, 1),
    inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
    fc1_dim=32)


def _run_e2e(tmp_path, *, final_top1_floor, **recipe_kw):
    n_classes = 3
    root, anno, labels = make_fake_kinetics(
        str(tmp_path / "kin"), n_classes=n_classes, videos_per_class=4,
        val_videos_per_class=3, n_frames=40, frame_size=(56, 44),
        class_coded=True)

    kw = dict(
        version="M", n_classes=n_classes,
        batch_size=8, max_epochs=6,
        dataset_size=80,  # iterations_per_epoch = 10 (sampler loops videos)
        frames=16, crop_size_override=32, gamma_tau_override=2,
        short_side=40, base_bs_per_replica=1, const_bn_size=1,
        warmup_steps=0, init_lr=0.02,  # long-0 LR = 8x this; keep it tame
        train_epochs_per_val=3, ckpt_every_steps=20,
        out_dir=str(tmp_path / "out"),
        num_devices=8, compute_dtype="fp32",
        model_overrides=TINY_MODEL, val_crops=3)
    kw.update(recipe_kw)
    recipe = KineticsRecipe(**kw)

    trainer = run(recipe, train_root=root, train_anno=anno,
                  val_root=root, val_anno=anno, labels=labels,
                  precompile=False)

    assert trainer.step_count == 60
    # checkpoints were written
    ckpts = [f for f in os.listdir(recipe.out_dir) if f.startswith("ckpt")]
    assert ckpts
    # two vals ran (after epochs 3 and 6); read the trajectory back from
    # the run's own JSONL record, the reference-log analog
    with open(os.path.join(recipe.out_dir, "train_log.jsonl")) as f:
        vals = [json.loads(l)["top1"] for l in f
                if json.loads(l).get("event") == "val"]
    assert len(vals) == 2, vals
    assert trainer.last_val_top1 == vals[-1]
    # learning trend: the final val must not regress below the mid-run
    # val, and must clear a floor calibrated to what this setup actually
    # reaches (not the 1/3 chance level, where plumbing bugs can hide)
    assert vals[-1] >= vals[0] - 0.12, vals   # small re-eval jitter margin
    assert vals[-1] >= final_top1_floor, vals
    return vals


_FLOOR = 0.55
# Floor calibration: the val set is 9 samples (top1 quantized in 1/9
# steps) and observed finals sit at 6/9-8/9 across library-version /
# ordering jitter; 5/9 = 0.556 is the lowest "still clearly learning"
# outcome, far above the 1/3 chance level where plumbing bugs hide, so
# the floor is one quantum under it.  The trend assertion above does the
# fine-grained regression catching.


@pytest.mark.slow
def test_run_end_to_end_learns(tmp_path):
    # high EMA rate so eval BN stats mature within the tiny schedule
    # (split stats reset at every long-cycle change; real schedules
    # have ~20k steps per cycle to refill them, this test has ~3)
    _run_e2e(tmp_path, bn_momentum=0.5, final_top1_floor=_FLOOR)


@pytest.mark.slow
def test_run_end_to_end_learns_default_momentum(tmp_path):
    """The SHIPPED default bn_momentum=0.1 path, end to end.  A compressed
    multigrid schedule resets split stats a handful of steps before val
    (real schedules have ~20k steps per cycle), which no momentum=0.1 run
    can mature — so this variant uses a flat long cycle (no split resets;
    the resize machinery is covered by the test above) and lets the default
    EMA rate accumulate over all 60 steps, as it would in a real cycle."""
    _run_e2e(tmp_path, long_cycle=(1, 1, 1, 1),
             long_cycle_lr_scale=(1.0, 1.0, 1.0, 1.0), init_lr=0.05,
             final_top1_floor=_FLOOR)
