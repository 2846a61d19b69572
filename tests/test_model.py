"""X3D model structure and behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.models import (
    x3d_config, init_params, init_bn_state, forward, replace_logits,
    resize_bn_splits, aggregate_all_subbn,
)

KEY = jax.random.PRNGKey(0)


def _count_params(p):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p))


class TestStructure:
    def test_m_version_param_count(self):
        """X3D-M has ~3.8M params (3.79M reported for X3D-M with 400
        classes + the repo's 2048-d fc1 head)."""
        cfg = x3d_config("M")
        p = init_params(KEY, cfg)
        n = _count_params(p)
        assert 3.0e6 < n < 4.5e6, n

    def test_stage_block_counts(self):
        cfg = x3d_config("M")
        p = init_params(KEY, cfg)
        assert [len(p[f"layer{i}"]) for i in (1, 2, 3, 4)] == [3, 5, 11, 7]
        cfg = x3d_config("XL")
        p = init_params(KEY, cfg)
        assert [len(p[f"layer{i}"]) for i in (1, 2, 3, 4)] == [5, 10, 25, 15]

    def test_se_on_even_blocks_only(self):
        p = init_params(KEY, x3d_config("M"))
        for stage in (1, 2, 3, 4):
            for i, blk in enumerate(p[f"layer{stage}"]):
                assert ("se" in blk) == (i % 2 == 0)

    def test_downsample_on_first_block_only(self):
        p = init_params(KEY, x3d_config("M"))
        for stage in (1, 2, 3, 4):
            for i, blk in enumerate(p[f"layer{stage}"]):
                assert ("downsample" in blk) == (i == 0)

    def test_replace_logits(self):
        p = init_params(KEY, x3d_config("M", n_classes=400))
        p2 = replace_logits(p, jax.random.PRNGKey(1), 157)
        assert p2["fc2"]["w"].shape == (2048, 157)
        assert p2["fc2"]["b"].shape == (157,)
        # trunk untouched
        np.testing.assert_array_equal(p2["conv1_s"]["w"], p["conv1_s"]["w"])


class TestForward:
    @pytest.mark.parametrize("hw", [32, 33])  # odd sizes occur in multigrid
    def test_class_forward_shapes(self, hw):
        cfg = x3d_config("M", n_classes=11)
        p = init_params(KEY, cfg)
        st = init_bn_state(cfg, num_splits=1)
        x = jnp.zeros((2, 4, hw, hw, 3))
        logits, _ = forward(p, st, x, cfg=cfg, train=False)
        assert logits.shape == (2, 11)

    def test_loc_forward_shapes(self):
        cfg = x3d_config("M", n_classes=7, task="loc")
        p = init_params(KEY, cfg)
        st = init_bn_state(cfg, num_splits=1)
        x = jnp.zeros((2, 6, 32, 32, 3))
        logits, _ = forward(p, st, x, cfg=cfg, train=False)
        assert logits.shape == (2, 6, 7)  # T preserved by spatial-only pool

    def test_train_updates_bn_state(self):
        cfg = x3d_config("M", n_classes=5)
        p = init_params(KEY, cfg)
        st = init_bn_state(cfg, num_splits=2)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 32, 32, 3))
        _, new_st = forward(p, st, x, cfg=cfg, train=True,
                            rng=jax.random.PRNGKey(3))
        before = st["bn1"]["split_mean"]
        after = new_st["bn1"]["split_mean"]
        assert not np.allclose(before, after)
        # eval stats untouched during training
        np.testing.assert_array_equal(st["bn1"]["mean"],
                                      new_st["bn1"]["mean"])

    def test_eval_does_not_touch_state(self):
        cfg = x3d_config("M", n_classes=5)
        p = init_params(KEY, cfg)
        st = init_bn_state(cfg, num_splits=2)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32, 32, 3))
        _, new_st = forward(p, st, x, cfg=cfg, train=False)
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(new_st)):
            np.testing.assert_array_equal(a, b)

    def test_eval_deterministic_and_batch_independent(self):
        cfg = x3d_config("M", n_classes=5, dropout=0.0)
        p = init_params(KEY, cfg)
        st = init_bn_state(cfg, num_splits=1)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 4, 32, 32, 3))
        full, _ = forward(p, st, x, cfg=cfg, train=False)
        half, _ = forward(p, st, x[:2], cfg=cfg, train=False)
        np.testing.assert_allclose(full[:2], half, rtol=1e-4, atol=1e-4)

    def test_resize_bn_splits_roundtrip(self):
        cfg = x3d_config("M", n_classes=5)
        st = init_bn_state(cfg, num_splits=4)
        st8 = resize_bn_splits(st, 8)
        assert st8["bn1"]["split_mean"].shape[0] == 8
        assert st8["layer3"][4]["bn2"]["split_mean"].shape[0] == 8
        p = init_params(KEY, cfg)
        x = jax.random.normal(jax.random.PRNGKey(5), (8, 2, 32, 32, 3))
        logits, _ = forward(p, st8, x, cfg=cfg, train=True,
                            rng=jax.random.PRNGKey(6))
        assert logits.shape == (8, 5)

    def test_aggregate_then_eval_close_to_train_stats(self):
        """After training steps + aggregation, eval normalization uses
        pooled split stats (the reference's pre-val aggregate call,
        train_x3d_kinetics_multigrid.py:205)."""
        cfg = x3d_config("M", n_classes=5, dropout=0.0)
        p = init_params(KEY, cfg)
        st = init_bn_state(cfg, num_splits=2)
        x = jax.random.normal(jax.random.PRNGKey(7), (4, 4, 32, 32, 3))
        for i in range(3):
            _, st = forward(p, st, x, cfg=cfg, train=True,
                            rng=jax.random.PRNGKey(i))
        agg = aggregate_all_subbn(st)
        sm = np.asarray(st["bn1"]["split_mean"])
        np.testing.assert_allclose(agg["bn1"]["mean"], sm.mean(0),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_flow(self):
        cfg = x3d_config("S", n_classes=5)
        p = init_params(KEY, cfg)
        st = init_bn_state(cfg, num_splits=1)
        x = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 32, 32, 3))
        y = jnp.array([1, 3])

        def loss_fn(params):
            logits, _ = forward(params, st, x, cfg=cfg, train=True,
                                rng=jax.random.PRNGKey(9))
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(2), y])

        g = jax.grad(loss_fn)(p)
        norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
        assert all(np.isfinite(n) for n in norms)
        assert sum(n > 0 for n in norms) > len(norms) * 0.9


class TestRematPolicies:
    def test_convs_policy_matches_no_remat_grads(self):
        """remat='convs' (save only checkpoint_name'd conv outputs) must
        be a pure scheduling change: same loss, same gradients."""
        import numpy as np
        from x3d_multigrid_tpu.models import (
            x3d_config, init_params, init_bn_state,
        )
        from x3d_multigrid_tpu.models.x3d import forward

        kw = dict(n_classes=5, blocks_override=(1, 1, 1, 1),
                  inplanes_override=((6, 4), (12, 8), (12, 8), (16, 8)),
                  fc1_dim=16)
        cfg0 = x3d_config("M", **kw)
        cfg1 = x3d_config("M", remat="convs", **kw)
        params = init_params(jax.random.PRNGKey(0), cfg0)
        bn = init_bn_state(cfg0, num_splits=2)
        x = jnp.asarray(np.random.RandomState(0).randn(
            4, 2, 16, 16, 3).astype(np.float32))

        def loss(p, cfg):
            logits, _ = forward(p, bn, x, cfg=cfg, train=True,
                                rng=jax.random.PRNGKey(1))
            return jnp.sum(jnp.sin(logits))

        l0, g0 = jax.value_and_grad(lambda p: loss(p, cfg0))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg1))(params)
        np.testing.assert_allclose(l0, l1, rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
