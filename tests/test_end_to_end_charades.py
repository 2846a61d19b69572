"""Charades fine-tune integration: the real run() loop (both tasks) on a
synthetic frame-folder dataset — exercises loaders, padded eval, plateau
LR, mAP metering and checkpointing together."""

import os

import numpy as np
import pytest

from x3d_multigrid_tpu.data.synthetic import make_fake_charades
from x3d_multigrid_tpu.train.recipes.charades import CharadesRecipe, run

TINY_MODEL = dict(
    blocks_override=(1, 1, 1, 1),
    inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
    fc1_dim=32)


@pytest.mark.slow
@pytest.mark.parametrize("task", ["class", "loc"])
def test_charades_run_end_to_end(tmp_path, task):
    root, split = make_fake_charades(
        str(tmp_path / "cha"), n_videos=12, n_frames=80,
        frame_size=(56, 44))

    recipe = CharadesRecipe(
        task=task, batch_size=8, max_epochs=2,
        frames=16, gamma_tau=2,           # doubled inside loaders -> T=8
        crop_size_override=32, short_side=40,
        train_epochs_per_val=2, ckpt_every_steps=2,
        out_dir=str(tmp_path / "out"), num_devices=8,
        compute_dtype="fp32", model_overrides=TINY_MODEL,
        val_crops=3, n_classes=157)

    trainer = run(recipe, root=root, anno=split)

    assert trainer.step_count == 2  # 4 train videos // batch 4 = 1 iter/ep
    assert trainer.last_val is not None
    assert 0.0 <= trainer.last_val["map"] <= 1.0
    assert np.isfinite(trainer.last_val["loss"])
    ckpts = [f for f in os.listdir(recipe.out_dir) if f.startswith("ckpt")]
    assert ckpts
