"""Charades fine-tune integration: the real run() loop (both tasks) on a
class-color-coded synthetic frame-folder dataset — exercises loaders,
padded eval, plateau LR, mAP metering and checkpointing together, and
asserts a LEARNING floor: the final val mAP must clear a calibrated bar
far above the prior-only level (the analog of the reference's mAP
trajectory in its Charades runs, train_x3d_charades.py:180-182)."""

import json
import os

import numpy as np
import pytest

from x3d_multigrid_tpu.data.synthetic import make_fake_charades
from x3d_multigrid_tpu.train.recipes.charades import CharadesRecipe, run

TINY_MODEL = dict(
    blocks_override=(1, 1, 1, 1),
    inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
    fc1_dim=32)

N_CLASSES = 8

# Floor calibration: every video carries 2 of 8 classes (video prevalence
# 0.25), so a prior-only/random scorer sits at mAP ~0.25 for the class
# task and ~0.13 per-frame for loc.  Calibrated finals on this setup are
# ~0.68-0.8 (class); the floors are the lowest "still clearly learning"
# outcomes across seed/library jitter, and the trend assertion catches
# finer regressions.
_FLOOR = {"class": 0.55, "loc": 0.30}

# Why num_devices=2 (not the 8-device mesh the Kinetics e2e uses): BN
# statistics are per-device (deliberately unsynced, matching the
# reference's per-GPU BN groups — PARITY.md §2.3), so DP width divides
# the batch into the BN groups.  batch 8 over 8 devices = groups of ONE
# sample, and per-sample normalization of a solid-color clip subtracts
# the very mean-color signal this fixture codes classes with — measured:
# mAP never leaves ~0.45-0.55 noise at 1 sample/group, climbs
# monotonically at >=4.  The reference fine-tunes Charades at 8
# clips/GPU (train_x3d_charades.py BS=32 over 4 GPUs) — groups of one
# are a degenerate config there too, not something to calibrate around.
_NUM_DEVICES = 2


@pytest.mark.slow
@pytest.mark.parametrize("task", ["class", "loc"])
def test_charades_run_end_to_end(tmp_path, task):
    # 24 videos -> 16 training / 8 testing (v % 3 == 2 rule); each video's
    # two half-duration actions are painted into the frames, so per-frame
    # appearance == per-frame label.
    root, split = make_fake_charades(
        str(tmp_path / "cha"), n_videos=24, n_frames=80,
        frame_size=(56, 44), class_coded=True, n_classes=N_CLASSES)

    # Per-task optimization knobs: the loc head's per-frame BCE needs a
    # hotter LR and a longer run to take off on the tiny fixture — and
    # HOW it takes off is host-fp-sensitive: lr .05/20ep reached 0.40 on
    # the r4 host but plateaus at ~0.19-0.22 on the r5 host (different
    # XLA:CPU codegen -> different trajectory through a bifurcation).
    # Swept on the r5 host: lr .1/30ep = 0.48 final (only robust config;
    # lr .02/.05/.08 at <=30ep all plateau ~0.21).
    epochs = {"class": 20, "loc": 30}[task]
    recipe = CharadesRecipe(
        task=task, n_classes=N_CLASSES,
        batch_size=8, max_epochs=epochs,
        frames=16, gamma_tau=2,           # doubled inside loaders -> T=8
        crop_size_override=32, short_side=40,
        train_epochs_per_val=5, ckpt_every_steps=10,
        init_lr={"class": 0.05, "loc": 0.1}[task],
        bn_momentum=0.5,                  # short run: eval stats catch up
        out_dir=str(tmp_path / "out"), num_devices=_NUM_DEVICES,
        compute_dtype="fp32", model_overrides=TINY_MODEL,
        val_crops=3)

    trainer = run(recipe, root=root, anno=split)

    # 16 videos // batch 8 = 2 iters/epoch
    assert trainer.step_count == 2 * epochs
    assert trainer.last_val is not None
    assert np.isfinite(trainer.last_val["loss"])
    ckpts = [f for f in os.listdir(recipe.out_dir) if f.startswith("ckpt")]
    assert ckpts
    # one val per 5 train epochs; read the mAP trajectory back from
    # the run's own JSONL record
    with open(os.path.join(recipe.out_dir, f"{task}_log.jsonl")) as f:
        vals = [json.loads(l)["map"] for l in f
                if json.loads(l).get("event") == "val"]
    assert len(vals) == epochs // 5, vals
    assert trainer.last_val["map"] == vals[-1]
    # learning: final mAP clears the calibrated floor (far above prior)
    # and does not regress below the mid-run val by more than jitter
    assert vals[-1] >= vals[1] - 0.12, vals
    assert vals[-1] >= _FLOOR[task], vals
