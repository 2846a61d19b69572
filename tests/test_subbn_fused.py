"""Fused Pallas SubBN kernel vs the XLA expression: forward, running-stat,
and gradient parity (CPU interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.ops import subbn
from x3d_multigrid_tpu.ops.subbn import (
    init_subbn_state, sub_batch_norm, set_fused_train,
)
from x3d_multigrid_tpu.ops.pallas.subbn_fused import subbn_train_fused


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_fused_train("auto")


def _data(splits=2, seed=0, c=6):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(8, 3, 5, 5, c).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    return x, scale, bias


class TestFusedForward:
    @pytest.mark.parametrize("splits", [1, 2, 4])
    def test_matches_xla_impl(self, splits):
        x, scale, bias = _data(splits)
        st = init_subbn_state(x.shape[-1], splits)

        set_fused_train(False)
        y_ref, st_ref = sub_batch_norm(x, scale, bias, st, train=True)
        set_fused_train(True)
        y_fused, st_fused = sub_batch_norm(x, scale, bias, st, train=True)

        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)
        for k in ("split_mean", "split_var"):
            np.testing.assert_allclose(np.asarray(st_fused[k]),
                                       np.asarray(st_ref[k]),
                                       rtol=1e-4, atol=1e-5)

    def test_direct_outputs(self):
        x, scale, bias = _data(2)
        y, mean, var = subbn_train_fused(x, scale, bias, 2)
        xg = np.asarray(x).reshape(4, 2, 3, 5, 5, 6)
        np.testing.assert_allclose(mean, xg.mean(axis=(0, 2, 3, 4)),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(var, xg.var(axis=(0, 2, 3, 4)),
                                   rtol=1e-4, atol=1e-5)


class TestFusedGradients:
    @pytest.mark.parametrize("splits", [1, 2])
    def test_grads_match_autodiff_of_xla_impl(self, splits):
        x, scale, bias = _data(splits, seed=3)
        st = init_subbn_state(x.shape[-1], splits)

        def loss(impl_fused, xx, sc, bi):
            set_fused_train(impl_fused)
            y, _ = sub_batch_norm(xx, sc, bi, st, train=True)
            return jnp.sum(jnp.sin(y))  # nontrivial cotangent

        g_ref = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(
            x, scale, bias)
        g_fused = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(
            x, scale, bias)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
