"""Orbax checkpoint backend: round-trip, retention, npz interchange."""

import numpy as np
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.train import init_momentum
from x3d_multigrid_tpu.train.orbax_ckpt import (
    OrbaxCheckpointer, have_orbax, npz_to_orbax, orbax_to_npz,
)
from x3d_multigrid_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint,
)

pytestmark = pytest.mark.skipif(not have_orbax(),
                                reason="orbax not installed")

# tiny model so the test is fast on the 1-core host
CFG = x3d_config("M", n_classes=11, blocks_override=(1, 1, 1, 1),
                 inplanes_override=((6, 4), (12, 8), (12, 8), (16, 8)))


def _trees(seed=0):
    import jax
    params = init_params(jax.random.PRNGKey(seed), CFG)
    bn = init_bn_state(CFG, num_splits=2)
    mom = init_momentum(params)
    return params, bn, mom


def _assert_tree_equal(a, b):
    import jax
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trainer_orbax_backend_roundtrip(tmp_path):
    """MultigridTrainer(ckpt_backend='orbax'): save -> fresh trainer ->
    restore(dir) resumes step/schedule/LR state like the npz path."""
    import jax
    from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
        KineticsRecipe, MultigridTrainer,
    )
    from x3d_multigrid_tpu.data.synthetic import synthetic_train_batch

    recipe = KineticsRecipe(
        batch_size=32, max_epochs=2, dataset_size=256, warmup_steps=2,
        frames=16, crop_size_override=32, gamma_tau_override=2,
        base_bs_per_replica=4, const_bn_size=2, short_side=40,
        compute_dtype=None, out_dir=str(tmp_path / "run"),
        ckpt_backend="orbax", num_devices=8,
        model_overrides=dict(
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((6, 4), (12, 8), (12, 8), (16, 8)),
            fc1_dim=16))
    trainer = MultigridTrainer(recipe, seed=0)
    for i, plan in enumerate(trainer.schedule.epoch(3)):
        batch = synthetic_train_batch(
            plan.batch_size, plan.frames, recipe.crop_size,
            n_classes=recipe.n_classes, seed=i)
        batch["plan"] = plan
        trainer.train_batch(batch)
    path = trainer.save()
    trainer._orbax_mgr().wait()
    assert path.endswith("orbax")

    fresh = MultigridTrainer(recipe, seed=1)
    fresh.restore(path)
    assert fresh.step_count == trainer.step_count
    assert fresh.iterations == trainer.iterations
    assert fresh.bn_splits == trainer.bn_splits
    _assert_tree_equal(fresh.params, trainer.params)
    _assert_tree_equal(fresh.bn_state, trainer.bn_state)
    assert fresh.lr_ctrl.state_dict() == trainer.lr_ctrl.state_dict()


def test_charades_orbax_backend_roundtrip(tmp_path):
    """CharadesTrainer(ckpt_backend='orbax'): save -> restore(dir) resumes
    step/epoch/plateau-LR state (parity extra: the Kinetics recipe's
    production backend now covers all three workloads)."""
    from x3d_multigrid_tpu.train.recipes.charades import (
        CharadesRecipe, CharadesTrainer, run_synthetic,
    )

    recipe = CharadesRecipe(
        task="class", batch_size=8, frames=16, gamma_tau=2,
        crop_size_override=32, short_side=40, n_classes=13,
        compute_dtype=None, num_devices=8, ckpt_backend="orbax",
        out_dir=str(tmp_path / "run"),
        model_overrides=dict(
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((6, 4), (12, 8), (12, 8), (16, 8)),
            fc1_dim=16))
    trainer = run_synthetic(recipe, iterations=2)
    trainer.lr_ctrl.step(1.0)  # exercise plateau state
    trainer.lr_ctrl.step(2.0)
    path = trainer.save()
    trainer._orbax.wait()
    assert path.endswith("orbax_class")

    fresh = CharadesTrainer(recipe, seed=5)
    fresh.restore(path)
    assert fresh.step_count == trainer.step_count
    assert fresh.epochs == trainer.epochs
    _assert_tree_equal(fresh.params, trainer.params)
    _assert_tree_equal(fresh.bn_state, trainer.bn_state)
    _assert_tree_equal(fresh.momentum, trainer.momentum)
    assert fresh.lr_ctrl.lr == trainer.lr_ctrl.lr
    assert fresh.lr_ctrl.state_dict()["num_bad"] == \
        trainer.lr_ctrl.state_dict()["num_bad"]


def test_save_restore_roundtrip(tmp_path):
    params, bn, mom = _trees()
    ckpt = OrbaxCheckpointer(str(tmp_path / "run"), async_save=True)
    try:
        ckpt.save(40, params=params, bn_state=bn, momentum=mom,
                  meta={"long_ind": 2, "lr_step": 40})
        ckpt.wait()
        out = ckpt.restore()
        assert out["step"] == 40
        assert out["meta"] == {"long_ind": 2, "lr_step": 40}
        _assert_tree_equal(out["params"], params)
        _assert_tree_equal(out["bn_state"], bn)
        _assert_tree_equal(out["momentum"], mom)
    finally:
        ckpt.close()


def test_retention_prunes_old_steps(tmp_path):
    params, bn, _ = _trees()
    ckpt = OrbaxCheckpointer(str(tmp_path / "run"), max_to_keep=2,
                             async_save=False)
    try:
        for step in (1, 2, 3):
            ckpt.save(step, params=params, bn_state=bn)
        ckpt.wait()
        assert sorted(ckpt.all_steps()) == [2, 3]
    finally:
        ckpt.close()


def test_npz_interchange(tmp_path):
    params, bn, mom = _trees(seed=3)
    npz = str(tmp_path / "a.npz")
    save_checkpoint(npz, params=params, bn_state=bn, momentum=mom,
                    meta={"step": 7})
    npz_to_orbax(npz, str(tmp_path / "orb"), step=7)
    back = str(tmp_path / "b.npz")
    orbax_to_npz(str(tmp_path / "orb"), back)
    data = load_checkpoint(back)
    _assert_tree_equal(data["params"], params)
    _assert_tree_equal(data["bn_state"], bn)
    _assert_tree_equal(data["momentum"], mom)
    assert data["meta"] == {"step": 7}
