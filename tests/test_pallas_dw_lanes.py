"""Dense-lane Pallas depthwise conv (ops/pallas/dw_conv3d_lanes.py):
fwd/dx/dk vs the XLA depthwise conv oracle, interpret mode on CPU.

Status note: the kernel is numerically exact but measured SLOWER than XLA
on v5e (the op is VPU-bound at ~27 FMAs/element and XLA's schedule is
tighter — docs/roofline.md) — it is intentionally NOT wired into the
model; these tests keep the experimental kernel honest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from x3d_multigrid_tpu.ops.conv3d import depthwise_conv3d
from x3d_multigrid_tpu.ops.pallas.dw_conv3d_lanes import dw_conv3d_lanes


@pytest.mark.parametrize("shape", [
    (2, 4, 8, 6, 5),     # ragged everything
    (1, 2, 8, 4, 8),     # small T edge masks
    (2, 1, 5, 3, 7),     # T=1: both temporal taps masked
])
def test_fwd_matches_xla(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[-1]
    k = jnp.asarray(rng.randn(3, 3, 3, 1, c).astype(np.float32))
    ref = depthwise_conv3d(x, k)
    out = dw_conv3d_lanes(x, k, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_xla():
    rng = np.random.RandomState(1)
    shape = (2, 3, 6, 5, 4)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 1, 4).astype(np.float32))
    co = jnp.asarray(rng.randn(*shape).astype(np.float32))  # cotangent mix

    def loss_ref(x, k):
        return jnp.sum(depthwise_conv3d(x, k) * co)

    def loss_new(x, k):
        return jnp.sum(dw_conv3d_lanes(x, k, True) * co)

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_n, gk_n = jax.grad(loss_new, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_n), np.asarray(gk_r),
                               rtol=1e-5, atol=2e-4)
