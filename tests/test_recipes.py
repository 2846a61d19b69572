"""Recipe-level integration tests on the 8-virtual-device CPU mesh with a
tiny model/geometry: multigrid transitions, checkpoint resume, Charades
train/eval paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KineticsRecipe, MultigridTrainer, run_synthetic,
)
from x3d_multigrid_tpu.train.recipes.charades import (
    CharadesRecipe, CharadesTrainer,
    run_synthetic as run_charades_synthetic,
)
from x3d_multigrid_tpu.data.synthetic import synthetic_train_batch

TINY_MODEL = dict(
    blocks_override=(1, 1, 1, 1),
    inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
    fc1_dim=32)


def tiny_kinetics_recipe(**kw):
    base = dict(
        batch_size=32, max_epochs=4, dataset_size=256, frames=16,
        crop_size_override=32, gamma_tau_override=2, short_side=40,
        base_bs_per_replica=4, const_bn_size=2, n_classes=11,
        model_overrides=TINY_MODEL, compute_dtype="fp32", num_devices=8,
        warmup_steps=0)
    base.update(kw)
    return KineticsRecipe(**base)


class TestKineticsRecipe:
    def test_synthetic_run_transitions_and_losses(self):
        trainer = run_synthetic(tiny_kinetics_recipe(), iterations=4)
        assert trainer.step_count == 4
        # splits = base(2) * long_scale; the tiny schedule may already have
        # advanced from long 0 (x8) to long 1 (x4) within 4 iterations
        assert trainer.bn_splits in (16, 8)
        assert np.isfinite(trainer.lr_ctrl.lr)

    def test_synthetic_device_data_grouped(self):
        """The training-record path: on-chip class-coded batches through
        the grouped lax.scan dispatch (device arrays must stack on device,
        not route through np.stack)."""
        trainer = run_synthetic(tiny_kinetics_recipe(), iterations=4,
                                group_size=2, class_coded=True,
                                device_data=True)
        assert trainer.step_count == 4
        assert np.isfinite(trainer.lr_ctrl.lr)

    @pytest.mark.slow  # ~12 min: compiles every bucket twice on 1 core
    @pytest.mark.parametrize("mode", ["accum", "grouped"])
    def test_precompile_warms_the_dispatched_step(self, mode):
        """precompile() must warm the step the configuration actually
        dispatches (grad/apply under accumulation, the grouped scan loop
        under group_size>1), not just the plain train step."""
        if mode == "accum":
            trainer = MultigridTrainer(
                tiny_kinetics_recipe(num_steps_per_update=2))
        else:
            trainer = MultigridTrainer(tiny_kinetics_recipe(),
                                       group_size=2)
        trainer.precompile()
        from x3d_multigrid_tpu.multigrid import enumerate_buckets
        n_buckets = len(enumerate_buckets(trainer.mcfg))
        if mode == "accum":
            assert trainer.grad_step._cache_size() == n_buckets
            assert trainer.apply_step._cache_size() == 1
        else:
            assert trainer._train_loop._cache_size() == n_buckets
            assert trainer.train_step._cache_size() == n_buckets

    def test_device_batch_matches_host_format(self):
        from x3d_multigrid_tpu.data.synthetic import (
            synthetic_train_batch_device,
        )
        b = synthetic_train_batch_device(jax.random.PRNGKey(0), 4, 2, 8,
                                         n_classes=5, class_coded=True)
        host = synthetic_train_batch(4, 2, 8, n_classes=5,
                                     class_coded=True)
        for k in host:
            assert np.asarray(b[k]).dtype == host[k].dtype, k
            assert np.asarray(b[k]).shape == host[k].shape, k
        assert np.asarray(b["label"]).min() >= 0
        assert np.asarray(b["label"]).max() < 5

    def test_long_cycle_transition_resizes_bn(self):
        # tiny total: 16 iterations -> phase1 = [0, 6); chunks of 1.6 =>
        # long index advances within a few iterations
        recipe = tiny_kinetics_recipe(max_epochs=2, dataset_size=64)
        trainer = MultigridTrainer(recipe)
        seen_splits = set()
        n = 0
        for plan in trainer.schedule.epoch(10):
            batch = synthetic_train_batch(
                plan.batch_size, plan.frames, recipe.crop_size,
                n_classes=recipe.n_classes, seed=n)
            batch["plan"] = plan
            trainer.train_batch(batch)
            seen_splits.add(trainer.bn_splits)
            n += 1
        assert len(seen_splits) >= 2  # at least one long-cycle change

    def test_save_restore_resumes_schedule(self, tmp_path):
        recipe = tiny_kinetics_recipe(out_dir=str(tmp_path))
        trainer = run_synthetic(recipe, iterations=3)
        path = trainer.save()

        fresh = MultigridTrainer(recipe)
        fresh.restore(path)
        assert fresh.step_count == trainer.step_count
        assert fresh.bn_splits == trainer.bn_splits
        assert fresh.schedule.last_long == trainer.schedule.last_long
        for a, b in zip(jax.tree.leaves(trainer.params),
                        jax.tree.leaves(fresh.params)):
            np.testing.assert_array_equal(a, b)
        # resumed schedule produces identical next plans
        p1 = list(trainer.schedule.epoch(3))
        p2 = list(fresh.schedule.epoch(3))
        assert [p.bucket_key for p in p1] == [p.bucket_key for p in p2]
        # and the restored trainer can keep stepping
        batch = synthetic_train_batch(p2[0].batch_size, p2[0].frames,
                                      recipe.crop_size,
                                      n_classes=recipe.n_classes)
        batch["plan"] = p2[0]
        out = fresh.train_batch(batch)
        assert np.isfinite(float(out["loss"]))


def tiny_charades_recipe(task):
    return CharadesRecipe(
        task=task, batch_size=8, frames=16, gamma_tau=2,
        crop_size_override=32, short_side=40, n_classes=13,
        model_overrides=TINY_MODEL, compute_dtype="fp32", num_devices=8)


class TestCharadesRecipe:
    def test_class_synthetic(self):
        trainer = run_charades_synthetic(tiny_charades_recipe("class"),
                                         iterations=2)
        assert trainer.step_count == 2

    def test_loc_synthetic(self):
        trainer = run_charades_synthetic(tiny_charades_recipe("loc"),
                                         iterations=2)
        assert trainer.step_count == 2

    @pytest.mark.parametrize("task", ["class", "loc"])
    def test_grouped_synthetic(self, task):
        """Grouped lax.scan dispatch (incl. the loc mask field) plus the
        partial-group flush for the odd remainder iteration."""
        trainer = run_charades_synthetic(tiny_charades_recipe(task),
                                         iterations=3, group_size=2)
        assert trainer.step_count == 3
        assert trainer._group_buf == []

    def test_grouped_matches_single_dispatch(self):
        """One grouped dispatch of 2 == 2 single steps (same data/rng
        structure aside: losses must be finite and params advance)."""
        t = CharadesTrainer(tiny_charades_recipe("class"), group_size=2)
        rng = np.random.RandomState(3)
        r = t.recipe
        for i in range(2):
            outs = t.train_batch_grouped({
                "clip": rng.randint(0, 255, (r.batch_size, r.model_frames,
                                             r.crop_size, r.crop_size, 3),
                                    np.uint8),
                "flip": rng.rand(r.batch_size) < 0.5,
                "label": (rng.rand(r.batch_size, r.n_classes) > 0.9
                          ).astype(np.float32)})
        assert len(outs) == 2 and t.step_count == 2
        assert all(np.isfinite(float(o["loss"])) for o in outs)

    def test_class_eval_epoch(self):
        trainer = CharadesTrainer(tiny_charades_recipe("class"))
        rng = np.random.RandomState(0)
        loader = [{
            "clip": rng.randint(0, 255, (8, 2, 8, 40, 40, 3), np.uint8),
            "label": (rng.rand(8, 13) > 0.8).astype(np.float32),
        }]
        out = trainer.eval_class_epoch(loader)
        assert 0.0 <= out["map"] <= 1.0
        assert np.isfinite(out["loss"])

    def test_loc_eval_epoch(self):
        trainer = CharadesTrainer(tiny_charades_recipe("loc"))
        rng = np.random.RandomState(1)
        loader = [{
            "clip": rng.randint(0, 255, (8, 8, 40, 40, 3), np.uint8),
            "label": (rng.rand(8, 64, 13) > 0.9).astype(np.float32),
            "mask": np.concatenate([np.ones((8, 50), np.float32),
                                    np.zeros((8, 14), np.float32)], 1),
        }]
        out = trainer.eval_loc_epoch(loader)
        assert 0.0 <= out["map"] <= 1.0
        assert np.isfinite(out["loss"])


class TestReviewRegressions:
    """Round-3 review fixes: padded-row masking, precompile fail-fast,
    profiler flush on short runs."""

    def test_class_eval_ignores_padded_rows(self):
        """Metrics over a batch with zero-padded invalid rows must equal
        metrics over the valid rows alone (the multi-host ragged-chunk
        layout, data/loader.py KineticsEvalLoader docstring)."""
        trainer = CharadesTrainer(tiny_charades_recipe("class"))
        rng = np.random.RandomState(0)
        clips = rng.randint(0, 255, (8, 2, 8, 40, 40, 3), np.uint8)
        labels = (rng.rand(8, 13) > 0.8).astype(np.float32)
        ref = trainer.eval_class_epoch([{"clip": clips, "label": labels}])
        padded = {
            "clip": np.concatenate([clips, np.zeros_like(clips[:4])]),
            "label": np.concatenate([labels, np.zeros_like(labels[:4])]),
            "valid": np.asarray([True] * 8 + [False] * 4),
        }
        trainer2 = CharadesTrainer(tiny_charades_recipe("class"))
        out = trainer2.eval_class_epoch([padded])
        assert out["map"] == pytest.approx(ref["map"], abs=1e-6)
        assert out["loss"] == pytest.approx(ref["loss"], rel=1e-5)

    def test_loc_eval_ignores_padded_rows(self):
        trainer = CharadesTrainer(tiny_charades_recipe("loc"))
        rng = np.random.RandomState(1)
        clips = rng.randint(0, 255, (8, 8, 40, 40, 3), np.uint8)
        labels = (rng.rand(8, 64, 13) > 0.9).astype(np.float32)
        mask = np.concatenate([np.ones((8, 50), np.float32),
                               np.zeros((8, 14), np.float32)], 1)
        ref = trainer.eval_loc_epoch(
            [{"clip": clips, "label": labels, "mask": mask}])
        padded = {
            "clip": np.concatenate([clips, np.zeros_like(clips[:4])]),
            "label": np.concatenate([labels, np.zeros_like(labels[:4])]),
            "mask": np.concatenate([mask, np.zeros_like(mask[:4])]),
            "valid": np.asarray([True] * 8 + [False] * 4),
        }
        trainer2 = CharadesTrainer(tiny_charades_recipe("loc"))
        out = trainer2.eval_loc_epoch([padded])
        assert out["map"] == pytest.approx(ref["map"], abs=1e-6)
        assert out["loss"] == pytest.approx(ref["loss"], rel=1e-5)

    def test_precompile_rejects_indivisible_process_count(self, monkeypatch):
        """Bucket batches that cannot split across hosts must fail BEFORE
        any compile work, matching the train loader's per-batch check."""
        trainer = MultigridTrainer(tiny_kinetics_recipe())
        monkeypatch.setattr(jax, "process_count", lambda: 3)
        with pytest.raises(ValueError, match="not divisible by 3"):
            trainer.precompile()

    def test_profiler_stops_on_short_run(self, tmp_path):
        """A run shorter than profile_steps must still close the trace at
        exit (otherwise nothing usable is ever written)."""
        recipe = tiny_kinetics_recipe(out_dir=str(tmp_path),
                                      profile_steps=100)
        trainer = run_synthetic(recipe, iterations=2)
        assert getattr(trainer, "_profiling", False) is False
