"""Free-offset Pallas depthwise conv vs the XLA oracle: forward, dx, dk,
both layouts, odd spatial sizes (CPU interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x3d_multigrid_tpu.ops.conv3d import depthwise_conv3d
from x3d_multigrid_tpu.ops.pallas import dw_conv3d_free as mod
from x3d_multigrid_tpu.ops.pallas.dw_conv3d_free import dw_conv3d_free


@pytest.fixture(autouse=True)
def _interpret():
    mod.set_interpret(True)
    yield
    mod.set_interpret(False)


def _data(n=4, t=3, h=8, w=5, c=6, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, t, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 1, c).astype(np.float32))
    return x, k


@pytest.mark.parametrize("layout", ["nc", "packed"])
@pytest.mark.parametrize("shape", [(4, 3, 8, 5, 6), (2, 2, 7, 7, 3),
                                   (4, 4, 4, 9, 13)])
def test_forward_matches_xla(layout, shape):
    x, k = _data(*shape)
    y_ref = depthwise_conv3d(x, k)
    y = dw_conv3d_free(x, k, layout)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("layout", ["nc", "packed"])
def test_grads_match_xla(layout):
    x, k = _data(seed=3)

    def loss_ref(xx, kk):
        return jnp.sum(jnp.sin(depthwise_conv3d(xx, kk)))

    def loss_new(xx, kk):
        return jnp.sum(jnp.sin(dw_conv3d_free(xx, kk, layout)))

    gx_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(loss_new, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-4)


def test_bf16_forward_close():
    x, k = _data(seed=5)
    y_ref = depthwise_conv3d(x.astype(jnp.bfloat16),
                             k.astype(jnp.bfloat16))
    y = dw_conv3d_free(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                       "packed")
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=5e-2, atol=5e-2)


def test_packed_layout_roundtrip():
    x, _ = _data()
    r = mod._from_packed(mod._to_packed(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(x))
