"""make_train_loop / make_grad_accum_step semantics on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.parallel import (
    data_mesh, make_train_step, make_train_loop, make_grad_accum_step,
)
from x3d_multigrid_tpu.train import init_momentum

TINY = dict(version="M", n_classes=5, dropout=0.0,
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)


def _setup():
    cfg = x3d_config(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bn = init_bn_state(cfg, 1)
    mom = init_momentum(params)
    batch = {
        "clip": jax.random.normal(jax.random.PRNGKey(1),
                                  (16, 2, 16, 16, 3)),
        "label": jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 5),
    }
    return cfg, params, bn, mom, batch


class TestTrainLoop:
    def test_loop_equals_sequential_steps(self):
        """K in-graph steps track K separate dispatches: k=1 is exact;
        longer horizons agree on the loss sequence (params drift by fp32
        reassociation amplified through BN/momentum — chaotic, not a
        semantic difference)."""
        cfg, params, bn, mom, batch = _setup()
        mesh = data_mesh(8)
        lr = jnp.float32(0.05)
        rng = jax.random.PRNGKey(7)
        k = 3

        loop = make_train_loop(cfg, mesh, num_steps=k, loss="kinetics",
                               per_step_batches=False)
        pl_, ml_, bl_, out = loop(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, mom),
            jax.tree.map(jnp.copy, bn), batch, lr, rng)

        step = make_train_step(cfg, mesh, loss="kinetics", donate=False)
        p, m, b = params, mom, bn
        losses = []
        for i in range(k):
            p, m, b, o = step(p, m, b, batch, lr,
                              jax.random.fold_in(rng, i))
            losses.append(float(o.loss))

        np.testing.assert_allclose(np.asarray(out.loss), losses, rtol=1e-5)

        # exactness at horizon 1
        loop1 = make_train_loop(cfg, mesh, num_steps=1, loss="kinetics",
                                per_step_batches=False)
        p1, _, _, _ = loop1(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, mom),
            jax.tree.map(jnp.copy, bn), batch, lr, rng)
        step1 = make_train_step(cfg, mesh, loss="kinetics", donate=False)
        ps, _, _, _ = step1(params, mom, bn, batch, lr,
                            jax.random.fold_in(rng, 0))
        for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(ps)):
            np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-6)

    def test_per_step_batches(self):
        cfg, params, bn, mom, batch = _setup()
        mesh = data_mesh(8)
        k = 2
        stacked = jax.tree.map(
            lambda x: jnp.stack([x, x * 0 + jnp.asarray(x)]), batch)
        loop = make_train_loop(cfg, mesh, num_steps=k, loss="kinetics",
                               per_step_batches=True)
        _, _, _, out = loop(jax.tree.map(jnp.copy, params),
                            jax.tree.map(jnp.copy, mom), bn, stacked,
                            jnp.float32(0.05), jax.random.PRNGKey(0))
        assert out.loss.shape == (k,)
        assert np.all(np.isfinite(np.asarray(out.loss)))


class TestGradAccum:
    def test_accum_one_equals_plain_step(self):
        """accum_steps=1 must match make_train_step exactly (same rng fold:
        micro index 0)."""
        cfg, params, bn, mom, batch = _setup()
        mesh = data_mesh(8)
        lr = jnp.float32(0.05)
        rng = jax.random.PRNGKey(3)

        micro = jax.tree.map(lambda x: x[None], batch)  # (1, B, ...)
        accum = make_grad_accum_step(cfg, mesh, accum_steps=1,
                                     loss="kinetics")
        pa, _, _, out_a = accum(jax.tree.map(jnp.copy, params),
                                jax.tree.map(jnp.copy, mom),
                                jax.tree.map(jnp.copy, bn), micro,
                                lr, rng)

        step = make_train_step(cfg, mesh, loss="kinetics", donate=False)
        ps, _, _, out_s = step(params, mom, bn, batch, lr,
                               jax.random.fold_in(rng, 0))

        np.testing.assert_allclose(float(out_a.loss), float(out_s.loss),
                                   rtol=1e-5)
        for a, c in zip(jax.tree.leaves(pa), jax.tree.leaves(ps)):
            np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-6)

    def test_accum_two_micro_batches(self):
        cfg, params, bn, mom, batch = _setup()
        mesh = data_mesh(8)
        micro = jax.tree.map(lambda x: jnp.stack([x, x]), batch)
        accum = make_grad_accum_step(cfg, mesh, accum_steps=2,
                                     loss="kinetics")
        pa, _, bna, out = accum(jax.tree.map(jnp.copy, params),
                                jax.tree.map(jnp.copy, mom),
                                jax.tree.map(jnp.copy, bn), micro,
                                jnp.float32(0.05), jax.random.PRNGKey(4))
        assert np.isfinite(float(out.loss))
        # params changed, BN stats updated twice
        diffs = [float(jnp.max(jnp.abs(a - b)))
                 for a, b in zip(jax.tree.leaves(pa),
                                 jax.tree.leaves(params))]
        assert max(diffs) > 0
