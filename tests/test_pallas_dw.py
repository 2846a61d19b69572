"""Pallas depthwise conv3d: correctness vs the XLA path (CPU interpret
mode via pallas on CPU backend) and VJP equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.ops.conv3d import depthwise_conv3d
from x3d_multigrid_tpu.ops.pallas.dw_conv3d import dw_conv3d_pallas


@pytest.mark.parametrize("stride,h,w,c", [
    (1, 8, 8, 8), (2, 8, 8, 8), (1, 7, 7, 16), (2, 9, 11, 8),
    (2, 14, 14, 24),
])
def test_forward_matches_xla(stride, h, w, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, h, w, c).astype(np.float32))
    wts = jnp.asarray(rng.randn(3, 3, 3, 1, c).astype(np.float32))
    ref = depthwise_conv3d(x, wts, spatial_stride=stride)
    out = dw_conv3d_pallas(x, wts, stride)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_vjp_matches_xla(stride):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 8, 8, 8).astype(np.float32))
    wts = jnp.asarray(rng.randn(3, 3, 3, 1, 8).astype(np.float32))

    def f_ref(x, w):
        return jnp.sum(depthwise_conv3d(x, w, spatial_stride=stride) ** 2)

    def f_pal(x, w):
        return jnp.sum(dw_conv3d_pallas(x, w, stride) ** 2)

    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, wts)
    gx_p, gw_p = jax.grad(f_pal, argnums=(0, 1))(x, wts)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)
