"""Pointwise-conv + SubBN-stats epilogue fusion (ops/pallas/pw_conv_stats):
kernel semantics (interpret mode), custom-VJP gradients, and full-model
train-step equivalence with the fusion switched on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_multigrid_tpu.models import x3d as x3d_mod
from x3d_multigrid_tpu.models import (
    x3d_config, init_params, init_bn_state, forward,
)
from x3d_multigrid_tpu.ops.pallas import pw_conv_stats as pw_mod
from x3d_multigrid_tpu.ops.pallas.pw_conv_stats import (
    pw_conv_subbn_stats, stats_from_sums, _xla_reference,
)
from x3d_multigrid_tpu.ops.subbn import sub_batch_norm, init_subbn_state

N, T, H, W, CIN, COUT, S = 4, 2, 4, 4, 6, 8, 2


def _data(dtype=jnp.float32):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, T, H, W, CIN), dtype)
    w = jnp.asarray(rng.randn(1, 1, 1, CIN, COUT) * 0.2, dtype)
    return x, w


@pytest.fixture
def interpret_kernel():
    old = pw_mod.INTERPRET
    pw_mod.INTERPRET = True
    yield
    pw_mod.INTERPRET = old


class TestKernel:
    def test_matches_xla_reference_interpret(self, interpret_kernel):
        """The real Pallas kernel (interpret mode: grid accumulation +
        dynamic split indexing) == the XLA composition."""
        x, w = _data()
        y, s_, q = jax.jit(
            lambda x, w: pw_conv_subbn_stats(x, w, S, jnp.float32))(x, w)
        yr, sr, qr = _xla_reference(x, w, S, jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_), np.asarray(sr),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(q), np.asarray(qr),
                                   rtol=1e-5, atol=1e-4)

    def test_bf16_materialization_semantics(self, interpret_kernel):
        """Stats are computed from the MATERIALIZED (bf16) y, matching
        what re-reading the stored activation would see."""
        x, w = _data()
        y, s_, q = jax.jit(
            lambda x, w: pw_conv_subbn_stats(x, w, S, jnp.bfloat16))(x, w)
        assert y.dtype == jnp.bfloat16
        yf = np.asarray(y, np.float32).reshape(N // S, S, T * H * W, COUT)
        np.testing.assert_allclose(np.asarray(s_), yf.sum(axis=(0, 2)),
                                   rtol=1e-3, atol=1e-2)

    def test_split_grouping_is_strided(self):
        """Row n contributes to split n % S (reference x3d.py:48-52)."""
        x, w = _data()
        # make sample 1 & 3 (split 1) loud
        x = x.at[1].add(10.0).at[3].add(10.0)
        _, s_, _ = pw_conv_subbn_stats(x, w, S, jnp.float32)
        assert float(jnp.abs(s_[1]).sum()) > float(jnp.abs(s_[0]).sum())


class TestGradients:
    def test_vjp_matches_unfused(self, interpret_kernel):
        """d(loss)/d(x, w) through (y, sum, sumsq) equals autodiff through
        the plain composition — including the stats' dependence on x."""
        x, w = _data()

        def fused(x, w):
            y, s_, q = pw_conv_subbn_stats(x, w, S, jnp.float32)
            m, v = stats_from_sums(s_, q, (N // S) * T * H * W)
            return jnp.sum(jnp.sin(y) + jnp.cos(m).sum() + jnp.sqrt(v + 1).sum())

        def unfused(x, w):
            y, s_, q = _xla_reference(x, w, S, jnp.float32)
            m, v = stats_from_sums(s_, q, (N // S) * T * H * W)
            return jnp.sum(jnp.sin(y) + jnp.cos(m).sum() + jnp.sqrt(v + 1).sum())

        gx_f, gw_f = jax.grad(fused, argnums=(0, 1))(x, w)
        gx_u, gw_u = jax.grad(unfused, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_u),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_u),
                                   rtol=1e-4, atol=1e-4)

    def test_subbn_with_stats_matches_inhouse(self):
        """sub_batch_norm(stats=...) == sub_batch_norm computing its own
        stats — output, new state, and gradients."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(N, T, H, W, COUT), jnp.float32)
        scale = jnp.asarray(rng.rand(COUT) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(COUT), jnp.float32)
        st = init_subbn_state(COUT, S)

        cnt = (N // S) * T * H * W
        xf = x.reshape(N // S, S, T * H * W, COUT)
        mean = jnp.sum(xf, axis=(0, 2)) / cnt
        var = jnp.maximum(jnp.sum(jnp.square(xf), axis=(0, 2)) / cnt
                          - jnp.square(mean), 0.0)

        def f_with(x, scale, bias):
            xs = x.reshape(N // S, S, T * H * W, COUT)
            m = jnp.sum(xs, axis=(0, 2)) / cnt
            v = jnp.maximum(jnp.sum(jnp.square(xs), axis=(0, 2)) / cnt
                            - jnp.square(m), 0.0)
            y, _ = sub_batch_norm(x, scale, bias, st, train=True,
                                  stats=(m, v))
            return jnp.sum(jnp.sin(y))

        def f_without(x, scale, bias):
            y, _ = sub_batch_norm(x, scale, bias, st, train=True)
            return jnp.sum(jnp.sin(y))

        y1, st1 = sub_batch_norm(x, scale, bias, st, train=True,
                                 stats=(mean, var))
        y0, st0 = sub_batch_norm(x, scale, bias, st, train=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-5, atol=1e-5)
        for k in ("split_mean", "split_var"):
            np.testing.assert_allclose(np.asarray(st1[k]),
                                       np.asarray(st0[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)
        g1 = jax.grad(f_with, argnums=(0, 1, 2))(x, scale, bias)
        g0 = jax.grad(f_without, argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestModelEquivalence:
    def test_forward_and_grads_match_with_epilogue_on(self):
        """Full tiny X3D train forward + grads: PW_STATS_EPILOGUE on
        (XLA fallback path of the fused op on CPU) == off."""
        cfg = x3d_config("M", n_classes=5, dropout=0.0,
                         blocks_override=(1, 1, 1, 1),
                         inplanes_override=((12, 8), (16, 8), (24, 16),
                                            (32, 16)),
                         fc1_dim=16)
        params = init_params(jax.random.PRNGKey(0), cfg)
        bn = init_bn_state(cfg, num_splits=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
        labels = jnp.asarray([0, 1, 2, 3])

        def loss_fn(p):
            logits, new_state = forward(p, bn, x, cfg=cfg, train=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[jnp.arange(4), labels]), new_state

        try:
            x3d_mod.set_pw_stats_epilogue(False)
            (l0, st0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params)
            x3d_mod.set_pw_stats_epilogue(True)
            (l1, st1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params)
        finally:
            x3d_mod.set_pw_stats_epilogue(False)
        assert abs(float(l1) - float(l0)) < 1e-5
        for (p0, a), (p1, b) in zip(
                jax.tree_util.tree_flatten_with_path(g0)[0],
                jax.tree_util.tree_flatten_with_path(g1)[0]):
            assert p0 == p1
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
                err_msg=jax.tree_util.keystr(p0))
        for (p0, a), (p1, b) in zip(
                jax.tree_util.tree_flatten_with_path(st0)[0],
                jax.tree_util.tree_flatten_with_path(st1)[0]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5,
                err_msg=jax.tree_util.keystr(p0))
