"""Gradient accumulation wired into the Kinetics recipe
(num_steps_per_update parity, train_x3d_kinetics_multigrid.py:119,267-277).

Covers: updates land every N micro-steps; LR milestones count UPDATE steps
(reference lr_schedule = [i // num_steps_per_update], :130); and the
micro-dispatch path (make_grad_microstep + make_apply_step) is numerically
identical to the stacked make_grad_accum_step oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.parallel import (
    data_mesh, make_grad_accum_step, make_grad_microstep, make_apply_step,
    accumulate_grads,
)
from x3d_multigrid_tpu.train import init_momentum
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KineticsRecipe, MultigridTrainer, KINETICS_MEAN, KINETICS_STD,
)
from x3d_multigrid_tpu.data.synthetic import synthetic_train_batch

TINY_MODEL = dict(
    blocks_override=(1, 1, 1, 1),
    inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
    fc1_dim=32)


def tiny_recipe(**kw):
    base = dict(
        batch_size=32, max_epochs=4, dataset_size=256, frames=16,
        crop_size_override=32, gamma_tau_override=2, short_side=40,
        base_bs_per_replica=4, const_bn_size=2, n_classes=11,
        model_overrides=TINY_MODEL, compute_dtype="fp32", num_devices=8,
        warmup_steps=0)
    base.update(kw)
    return KineticsRecipe(**base)


def _run_iters(trainer, recipe, n):
    outs = []
    i = 0
    while i < n:
        for plan in trainer.schedule.epoch(n - i):
            batch = synthetic_train_batch(
                plan.batch_size, plan.frames, recipe.crop_size,
                n_classes=recipe.n_classes, seed=i)
            batch["plan"] = plan
            outs.append(trainer.train_batch(batch))
            i += 1
    return outs


class TestRecipeAccumulation:
    def test_updates_every_nspu_micro_steps(self):
        recipe = tiny_recipe(num_steps_per_update=2)
        trainer = MultigridTrainer(recipe)
        p0 = jax.tree.map(np.asarray, trainer.params)

        outs = _run_iters(trainer, recipe, 4)
        assert [o["updated"] for o in outs] == [False, True, False, True]
        assert trainer.iterations == 4
        assert trainer.step_count == 2  # update steps, not micro-steps

        # params must be live-updated (changed from init) only via applies
        changed = jax.tree_util.tree_leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            trainer.params, p0))
        assert max(changed) > 0

    def test_no_update_before_group_full(self):
        recipe = tiny_recipe(num_steps_per_update=4)
        trainer = MultigridTrainer(recipe)
        p0 = jax.tree.map(np.asarray, trainer.params)
        outs = _run_iters(trainer, recipe, 3)
        assert all(not o["updated"] for o in outs)
        assert trainer.step_count == 0
        same = jax.tree_util.tree_leaves(jax.tree.map(
            lambda a, b: bool(np.array_equal(np.asarray(a), b)),
            trainer.params, p0))
        assert all(same)

    def test_milestones_counted_in_update_steps(self):
        # wiring check: trainer divides the multigrid milestones by nspu
        r2 = tiny_recipe(num_steps_per_update=2)
        t2 = MultigridTrainer(r2)
        expect = {m // 2 for m in t2.mcfg.lr_milestones}
        assert t2.lr_ctrl.milestones == expect

        # functional check: a milestone at update-step 2 fires after the
        # 2nd UPDATE (4th micro-step), not after the 2nd micro-step.
        # Long schedule (big dataset) so no long-cycle LR rescale intrudes.
        recipe = tiny_recipe(num_steps_per_update=2, dataset_size=16384,
                             max_epochs=64)
        trainer = MultigridTrainer(recipe)
        trainer.lr_ctrl.milestones = {2}
        outs = _run_iters(trainer, recipe, 6)
        lrs = [o["lr"] for o in outs if o["updated"]]
        # update 0 and 1 at full lr; milestone (global_step+1)==2 scales the
        # NEXT update's lr by 0.1 (torch MultiStepLR semantics)
        assert lrs[1] == lrs[0]
        assert np.isclose(lrs[2], 0.1 * lrs[0], rtol=1e-6)

    def test_group_size_conflict_rejected(self):
        recipe = tiny_recipe(num_steps_per_update=2)
        try:
            MultigridTrainer(recipe, group_size=2)
        except ValueError as e:
            assert "num_steps_per_update" in str(e)
        else:
            raise AssertionError("expected ValueError")


class TestMicrostepMatchesStackedOracle:
    def test_micro_dispatch_equals_grad_accum_step(self):
        """Two micro-dispatches + apply == one stacked make_grad_accum_step
        (which is itself tested against explicit per-sample math)."""
        cfg = x3d_config("M", n_classes=11, dropout=0.5, **TINY_MODEL)
        mesh = data_mesh(8)
        key = jax.random.PRNGKey(0)
        params = init_params(key, cfg)
        mom = init_momentum(params)
        bn = init_bn_state(cfg, 2)

        accum = 2
        b, t, c0, crop = 16, 4, 40, 32
        rngs = np.random.RandomState(0)
        batches = [{
            "clip": jnp.asarray(rngs.randint(0, 255, (b, t, c0, c0, 3),
                                             dtype=np.uint8)),
            "flip": jnp.asarray(rngs.rand(b) < 0.5),
            "label": jnp.asarray(rngs.randint(0, 11, (b,))),
        } for _ in range(accum)]

        mk = dict(loss="kinetics", compute_dtype=None,
                  preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD),
                  bn_momentum=0.1)
        rng = jax.random.PRNGKey(7)
        lr = jnp.float32(0.05)

        # oracle: stacked scan
        stacked = {k: jnp.stack([bb[k] for bb in batches])
                   for k in batches[0]}
        accum_step = make_grad_accum_step(
            cfg, mesh, accum_steps=accum, momentum=0.9, weight_decay=5e-5,
            **mk)
        p_ref, m_ref, bn_ref, out_ref = accum_step(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, mom),
            jax.tree.map(jnp.copy, bn), stacked, lr, rng, out_size=crop)

        # micro-dispatch path (same per-micro rng derivation: fold_in(idx))
        micro = make_grad_microstep(cfg, mesh, **mk)
        apply_step = make_apply_step(accum_steps=accum, momentum=0.9,
                                     weight_decay=5e-5)
        g_sum = None
        bn_cur = jax.tree.map(jnp.copy, bn)
        losses = []
        for i, bb in enumerate(batches):
            g, bn_cur, l, _ = micro(params, bn_cur, bb,
                                    jax.random.fold_in(rng, i),
                                    out_size=crop)
            losses.append(float(l))
            g_sum = g if g_sum is None else accumulate_grads(g_sum, g)
        p_new, m_new = apply_step(jax.tree.map(jnp.copy, params),
                                  jax.tree.map(jnp.copy, mom), g_sum, lr)

        # the stacked step reports the mean micro-loss
        np.testing.assert_allclose(np.asarray(out_ref.loss),
                                   np.mean(losses), rtol=1e-5)
        for a, bref in zip(jax.tree_util.tree_leaves(p_new),
                           jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bref),
                                       rtol=2e-5, atol=1e-6)
        for a, bref in zip(jax.tree_util.tree_leaves(bn_cur),
                           jax.tree_util.tree_leaves(bn_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bref),
                                       rtol=2e-5, atol=1e-6)
