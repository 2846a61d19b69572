"""SubBN "cvjp" mode (hand-written BN backward, folded-FMA forward) vs the
naive autodiffed XLA expression: forward, running stats, and gradients must
agree to float tolerance in both fp32 and fp64."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.ops import subbn
from x3d_multigrid_tpu.ops.subbn import (
    init_subbn_state, sub_batch_norm, set_fused_train,
)


@pytest.fixture(autouse=True)
def _restore_mode():
    prev = subbn.FUSED_TRAIN
    yield
    set_fused_train(prev)


def _data(seed=0, c=6, w=5, dtype=np.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(8, 3, 5, w, c).astype(dtype) * 2 + 1)
    scale = jnp.asarray(rng.rand(c).astype(dtype) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(dtype))
    return x, scale, bias


@pytest.mark.parametrize("splits", [1, 2, 4])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_forward_and_stats_match_naive(splits, dtype):
    with jax.enable_x64(dtype == np.float64):
        x, scale, bias = _data(seed=splits, dtype=dtype)
        st = init_subbn_state(x.shape[-1], splits,
                              dtype=jnp.asarray(x).dtype)

        set_fused_train(False)
        y_ref, st_ref = sub_batch_norm(x, scale, bias, st, train=True)
        set_fused_train("cvjp")
        y_new, st_new = sub_batch_norm(x, scale, bias, st, train=True)

        tol = 1e-5 if dtype == np.float32 else 1e-12
        np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                                   rtol=tol, atol=tol)
        for k in ("split_mean", "split_var"):
            np.testing.assert_allclose(np.asarray(st_new[k]),
                                       np.asarray(st_ref[k]),
                                       rtol=tol, atol=tol)


@pytest.mark.parametrize("splits", [1, 2])
@pytest.mark.parametrize("w,c", [(5, 6), (7, 13)])
def test_grads_match_autodiff(splits, w, c):
    """The hand-written bwd must equal autodiff of the naive expression,
    including the stats' dependence on x (the part stop_gradient'd in the
    primal and reinstated by the custom rule)."""
    with jax.enable_x64(True):
        x, scale, bias = _data(seed=3, c=c, w=w, dtype=np.float64)
        st = init_subbn_state(c, splits, dtype=jnp.float64)

        def loss(mode, xx, sc, bi):
            set_fused_train(mode)
            y, _ = sub_batch_norm(xx, sc, bi, st, train=True)
            return jnp.sum(jnp.sin(y))

        g_ref = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(
            x, scale, bias)
        g_new = jax.grad(lambda *a: loss("cvjp", *a), argnums=(0, 1, 2))(
            x, scale, bias)
        for a, b in zip(g_new, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-10)


def test_grads_under_scan_and_jit():
    """cvjp must be scan/jit-safe (it runs inside make_train_loop)."""
    x, scale, bias = _data(seed=7)
    st = init_subbn_state(x.shape[-1], 2)
    set_fused_train("cvjp")

    @jax.jit
    def f(xx, sc):
        def body(carry, _):
            y, _st = sub_batch_norm(carry, sc, bias, st, train=True)
            return y * 0.5, jnp.sum(y)
        out, sums = jax.lax.scan(body, xx, jnp.arange(2))
        return jnp.sum(out) + jnp.sum(sums)

    g = jax.grad(f)(x, scale)
    assert np.isfinite(np.asarray(g)).all()
