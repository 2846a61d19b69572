"""BN folding parity and the serving engine."""

import numpy as np
import jax
import jax.numpy as jnp

from x3d_multigrid_tpu.models import (
    x3d_config, init_params, init_bn_state, forward, aggregate_all_subbn,
)
from x3d_multigrid_tpu.models.folding import fold_bn, forward_folded
from x3d_multigrid_tpu.serving import InferenceEngine
from x3d_multigrid_tpu.train.checkpoint import save_checkpoint

TINY = dict(version="M", n_classes=7, dropout=0.0,
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)


def _trained_state(seed=0):
    """Params + bn state with non-trivial statistics (one train pass)."""
    cfg = x3d_config(**TINY)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    st = init_bn_state(cfg, 2)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (4, 2, 16, 16, 3))
    for i in range(2):
        _, st = forward(params, st, x, cfg=cfg, train=True,
                        rng=jax.random.PRNGKey(i))
    return cfg, params, aggregate_all_subbn(st)


class TestFolding:
    def test_folded_matches_eval_forward(self):
        cfg, params, st = _trained_state()
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 2, 16, 16, 3))
        ref, _ = forward(params, st, x, cfg=cfg, train=False)
        folded = fold_bn(params, st)
        out = forward_folded(folded, x, cfg=cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_folded_loc_task(self):
        cfg, params, st = _trained_state()
        cfg_loc = x3d_config(**{**TINY, "task": "loc"})
        ref, _ = forward(params, st,
                         jnp.zeros((1, 4, 16, 16, 3)), cfg=cfg_loc,
                         train=False)
        out = forward_folded(fold_bn(params, st),
                             jnp.zeros((1, 4, 16, 16, 3)), cfg=cfg_loc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestServing:
    def test_engine_from_checkpoint(self, tmp_path):
        cfg, params, st = _trained_state()
        path = str(tmp_path / "ck")
        save_checkpoint(path, params=params, bn_state=st)
        engine = InferenceEngine.from_checkpoint(
            path + ".npz", cfg, crop_size=16, compute_dtype=None)
        clips = np.random.RandomState(0).randint(
            0, 255, (3, 2, 2, 20, 20, 3), np.uint8)
        probs, preds = engine.classify(clips)
        assert probs.shape == (3, 7)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
        assert preds.shape == (3,)

    def test_single_view_input(self):
        cfg, params, st = _trained_state()
        engine = InferenceEngine(params, st, cfg, crop_size=16,
                                 compute_dtype=None)
        clips = np.zeros((2, 2, 20, 20, 3), np.uint8)
        probs, preds = engine.classify(clips)
        assert probs.shape == (2, 7)

    def test_localize(self):
        """Loc engine matches eval forward + interp + sigmoid by hand."""
        from x3d_multigrid_tpu.models import forward
        from x3d_multigrid_tpu.ops.interpolate import linear_interp_time
        from x3d_multigrid_tpu.ops.preprocess import eval_preprocess_impl
        _, params, st = _trained_state()
        cfg_loc = x3d_config(**{**TINY, "task": "loc"})
        engine = InferenceEngine(params, st, cfg_loc, crop_size=16,
                                 compute_dtype=None)
        clips = np.random.RandomState(1).randint(
            0, 255, (2, 4, 20, 20, 3), np.uint8)
        probs = engine.localize(clips, out_len=11)
        assert probs.shape == (2, 11, 7)
        assert (probs > 0).all() and (probs < 1).all()
        x = eval_preprocess_impl(jnp.asarray(clips),
                                 jnp.asarray(engine._mean),
                                 jnp.asarray(engine._std), out_size=16)
        ref, _ = forward(params, st, x, cfg=cfg_loc, train=False)
        ref = jax.nn.sigmoid(linear_interp_time(ref, 11))
        np.testing.assert_allclose(probs, np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_export_serialized_roundtrip(self):
        """AOT blob reproduces the engine's output with no model code."""
        from x3d_multigrid_tpu.serving import load_serialized
        cfg, params, st = _trained_state()
        engine = InferenceEngine(params, st, cfg, crop_size=16,
                                 compute_dtype=None)
        clips = np.random.RandomState(2).randint(
            0, 255, (2, 3, 2, 20, 20, 3), np.uint8)
        blob = engine.export_serialized(2, 2, 20, n_views=3,
                                        platforms=("cpu",))
        assert isinstance(blob, bytes) and len(blob) > 0
        probs, preds = engine.classify(clips)
        probs2, preds2 = load_serialized(blob)(jnp.asarray(clips))
        np.testing.assert_allclose(np.asarray(probs2), probs,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(preds2), preds)

        cfg_loc = x3d_config(**{**TINY, "task": "loc"})
        eng_loc = InferenceEngine(params, st, cfg_loc, crop_size=16,
                                  compute_dtype=None)
        blob = eng_loc.export_serialized(1, 4, 20, out_len=9,
                                         platforms=("cpu",))
        x = np.random.RandomState(3).randint(
            0, 255, (1, 4, 20, 20, 3), np.uint8)
        np.testing.assert_allclose(
            np.asarray(load_serialized(blob)(jnp.asarray(x))),
            eng_loc.localize(x, 9), rtol=1e-5, atol=1e-6)

    def test_task_guards(self):
        cfg, params, st = _trained_state()
        engine = InferenceEngine(params, st, cfg, crop_size=16,
                                 compute_dtype=None)
        try:
            engine.localize(np.zeros((1, 2, 20, 20, 3), np.uint8), 4)
            assert False, "expected ValueError"
        except ValueError:
            pass
