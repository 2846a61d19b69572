"""Spatial / sequence parallelism (parallel/spatial.py): GSPMD-sharded
eval over a 2-D (data, spatial) mesh must equal the unsharded forward.

The reference has no analog — its only parallelism is batch DP
(nn.DataParallel); sharding inside one clip is a TPU-native capability
(XLA SPMD halo exchange) that makes batch-1 whole-video localization
scale across chips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_multigrid_tpu.models import (
    x3d_config, init_params, init_bn_state, forward,
)
from x3d_multigrid_tpu.parallel.spatial import (
    data_spatial_mesh, make_sharded_eval_step, shard_clip, SPATIAL_AXIS,
)

TINY = dict(version="M", n_classes=5,
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)


def _tiny_model(task="class", seed=0):
    cfg = x3d_config(**TINY, task=task, dropout=0.0)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    bn = init_bn_state(cfg, num_splits=1)
    return cfg, params, bn


def _reference_logits(cfg, params, bn, clip):
    logits, _ = forward(params, bn, clip, cfg=cfg, train=False)
    return np.asarray(logits, np.float32)


class TestShardedEval:
    def test_h_sharded_matches_unsharded(self):
        cfg, params, bn = _tiny_model("class")
        clip = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3),
                                 jnp.float32)
        want = _reference_logits(cfg, params, bn, clip)

        mesh = data_spatial_mesh(2, 4)
        step = make_sharded_eval_step(cfg, mesh, shard_dim="H")
        got = np.asarray(step(params, bn, clip))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_t_sharded_batch1_loc(self):
        """Sequence parallelism on the localization task: one whole-video
        clip sharded over all 8 devices on the frame axis."""
        cfg, params, bn = _tiny_model("loc")
        clip = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32, 32, 3),
                                 jnp.float32)
        want = _reference_logits(cfg, params, bn, clip)  # (1, T', C)

        mesh = data_spatial_mesh(1, 8)
        step = make_sharded_eval_step(cfg, mesh, shard_dim="T")
        got = np.asarray(step(params, bn, clip))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_pre_placed_clip_and_uint8_preprocess(self):
        """shard_clip pre-placement + the fused uint8 preprocess path run
        under spatial sharding and match the sharded float path."""
        cfg, params, bn = _tiny_model("class")
        mesh = data_spatial_mesh(2, 4)
        u8 = jax.random.randint(jax.random.PRNGKey(3), (4, 4, 32, 32, 3),
                                0, 256, jnp.uint8)
        mean, std = (110.0, 100.0, 95.0), (58.0, 57.0, 59.0)

        step = make_sharded_eval_step(cfg, mesh, shard_dim="H",
                                      preprocess_mean_std=(mean, std))
        placed = shard_clip(u8, mesh, "H")
        got = np.asarray(step(params, bn, placed, 32))

        from x3d_multigrid_tpu.ops.preprocess import eval_preprocess_impl
        ref_clip = eval_preprocess_impl(
            u8, jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32),
            out_size=32)
        want = _reference_logits(cfg, params, bn, ref_clip)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_serving_engine_sharded_classify(self):
        """InferenceEngine(mesh=...) shards classify over (data, spatial)
        and matches the unsharded engine exactly (same BN folding both
        sides, fp32 compute)."""
        from x3d_multigrid_tpu.serving import InferenceEngine
        cfg, params, bn = _tiny_model("class")
        u8 = np.random.RandomState(0).randint(
            0, 256, (4, 2, 4, 32, 32, 3), np.uint8)

        plain = InferenceEngine(params, bn, cfg, crop_size=32,
                                compute_dtype=None)
        want_probs, want_preds = plain.classify(u8)

        mesh = data_spatial_mesh(2, 4)
        sharded = InferenceEngine(params, bn, cfg, crop_size=32,
                                  compute_dtype=None, mesh=mesh,
                                  shard_dim="H")
        got_probs, got_preds = sharded.classify(u8)
        np.testing.assert_allclose(got_probs, want_probs,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(got_preds, want_preds)

    def test_serving_engine_sequence_parallel_localize(self):
        """Batch-1 whole-video localization, frames sharded over all 8
        devices through the serving engine."""
        from x3d_multigrid_tpu.serving import InferenceEngine
        cfg, params, bn = _tiny_model("loc")
        u8 = np.random.RandomState(1).randint(
            0, 256, (1, 16, 32, 32, 3), np.uint8)

        plain = InferenceEngine(params, bn, cfg, crop_size=32,
                                compute_dtype=None)
        want = plain.localize(u8, out_len=37)

        mesh = data_spatial_mesh(1, 8)
        sharded = InferenceEngine(params, bn, cfg, crop_size=32,
                                  compute_dtype=None, mesh=mesh,
                                  shard_dim="T")
        got = sharded.localize(u8, out_len=37)
        assert got.shape == (1, 37, cfg.n_classes)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_serving_engine_export_ignores_mesh(self):
        """export_serialized from a mesh-backed engine produces a
        topology-free blob that reloads and matches."""
        from x3d_multigrid_tpu.serving import (
            InferenceEngine, load_serialized,
        )
        cfg, params, bn = _tiny_model("class")
        mesh = data_spatial_mesh(2, 4)
        eng = InferenceEngine(params, bn, cfg, crop_size=32,
                              compute_dtype=None, mesh=mesh)
        u8 = np.random.RandomState(2).randint(
            0, 256, (2, 1, 4, 32, 32, 3), np.uint8)
        blob = eng.export_serialized(2, 4, 32, n_views=1, platforms=("cpu",))
        probs, preds = load_serialized(blob)(u8)
        want_probs, want_preds = eng.classify(u8)
        np.testing.assert_allclose(np.asarray(probs), want_probs,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(preds), want_preds)

    def test_serving_engine_shard_dim_validation(self):
        from x3d_multigrid_tpu.serving import InferenceEngine
        cfg, params, bn = _tiny_model("class")
        mesh = data_spatial_mesh(2, 2)
        with pytest.raises(ValueError, match="shard_dim"):
            InferenceEngine(params, bn, cfg, crop_size=32, mesh=mesh,
                            shard_dim="W")

    def test_validation(self):
        cfg, _, _ = _tiny_model("class")
        with pytest.raises(ValueError, match="devices"):
            data_spatial_mesh(4, 4)  # 16 > 8 virtual devices
        mesh = data_spatial_mesh(2, 2)
        assert mesh.axis_names == ("data", SPATIAL_AXIS)
        with pytest.raises(ValueError, match="shard_dim"):
            make_sharded_eval_step(cfg, mesh, shard_dim="W")
