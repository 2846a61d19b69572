"""Measure the pointwise-conv + SubBN-stats epilogue fusion on the TPU.

Two sections (docs/roofline.md methodology: in-graph fori_loop chains,
ITERS >= 64, results forced with a float() fetch; ONE TPU client at a
time):

  isolated — the real conv->BN-normalize->conv consumption pattern per
    X3D-M pointwise shape: fused (ops/pallas/pw_conv_stats kernel emits
    y + per-split sums in one pass) vs unfused (XLA conv + separate
    stats reductions, the shipped default).
  step — the full fine-bucket (128,8,224,4) train step with
    models.x3d.set_pw_stats_epilogue on/off.

Run: python tools/bench_pw_stats.py [--section isolated|step|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.ops.conv3d import pointwise_conv3d
from x3d_multigrid_tpu.ops.pallas.pw_conv_stats import (
    pw_conv_subbn_stats, stats_from_sums, _xla_reference,
)
from x3d_multigrid_tpu.models import x3d as x3d_mod

# (N, T, H, W, Cin) -> Cout for every pointwise conv of X3D-M at the fine
# bucket (per-chip batch 32): stage s block-0 conv1 runs pre-stride.
PW_SHAPES = [
    ((32, 8, 112, 112, 24), 54),    # s1 b0 conv1 (expand)
    ((32, 8, 56, 56, 54), 24),      # s1 conv3 (project)
    ((32, 8, 56, 56, 24), 108),     # s2 conv1
    ((32, 8, 28, 28, 108), 48),     # s2 conv3
    ((32, 8, 28, 28, 48), 216),     # s3 conv1
    ((32, 8, 14, 14, 216), 96),     # s3 conv3
    ((32, 8, 14, 14, 96), 432),     # s4 conv1
    ((32, 8, 7, 7, 432), 192),      # s4 conv3
]
SPLITS = 4


def _force(tree):
    leaves = jax.tree.leaves(tree)
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def _chain_time(make_step, x0, iters, label):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda _, c: make_step(c), x)

    y = run(x0)
    _force(y)
    t0 = time.perf_counter()
    y = run(x0)
    _force(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:>18}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def bench_isolated(iters, dtype):
    eps = 1e-5
    for (shape, cout) in PW_SHAPES:
        n, t, h, w, cin = shape
        cnt = (n // SPLITS) * t * h * w
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
        w1 = jnp.asarray(0.2 * rng.randn(1, 1, 1, cin, cout).astype(
            np.float32)).astype(dtype)
        w2 = jnp.asarray(0.2 * rng.randn(1, 1, 1, cout, cin).astype(
            np.float32)).astype(dtype)
        print(f"# pw {shape} -> {cout} {jnp.dtype(dtype).name}", flush=True)

        def _consume(y, mean, var, xx):
            # the model's real consumption: normalize y with the split
            # stats, project back to Cin to keep the chain shape-stable
            inv = jax.lax.rsqrt(var + eps)
            yg = y.reshape(n // SPLITS, SPLITS, *y.shape[1:])
            yn = ((yg - mean[None, :, None, None, None, :].astype(y.dtype))
                  * inv[None, :, None, None, None, :].astype(y.dtype)
                  ).reshape(y.shape)
            return (pointwise_conv3d(yn, w2) * 0.05
                    + xx * 0.95).astype(xx.dtype)

        def fused_step(xx):
            y, s, q = pw_conv_subbn_stats(xx, w1, SPLITS, xx.dtype)
            mean, var = stats_from_sums(s, q, cnt)
            return _consume(y, mean, var, xx)

        def unfused_step(xx):
            y, s, q = _xla_reference(xx, w1, SPLITS, xx.dtype)
            mean, var = stats_from_sums(s, q, cnt)
            return _consume(y, mean, var, xx)

        def fused_bwd(xx):
            g = jax.grad(lambda z: jnp.sum(jnp.sin(
                fused_step(z).astype(jnp.float32))))(xx)
            return xx - 1e-6 * g.astype(xx.dtype)

        def unfused_bwd(xx):
            g = jax.grad(lambda z: jnp.sum(jnp.sin(
                unfused_step(z).astype(jnp.float32))))(xx)
            return xx - 1e-6 * g.astype(xx.dtype)

        t_u = _chain_time(unfused_step, x0, iters, "xla fwd")
        t_f = _chain_time(fused_step, x0, iters, "fused fwd")
        tb_u = _chain_time(unfused_bwd, x0, iters, "xla fwd+bwd")
        tb_f = _chain_time(fused_bwd, x0, iters, "fused fwd+bwd")
        print(f"  fwd {t_u/t_f:5.2f}x  fwd+bwd {tb_u/tb_f:5.2f}x "
              f"(>1 = fused wins)", flush=True)


def bench_step(steps, dtype_name):
    from x3d_multigrid_tpu.models import (
        x3d_config, init_params, init_bn_state,
    )
    from x3d_multigrid_tpu.parallel import data_mesh, make_train_loop
    from x3d_multigrid_tpu.train import init_momentum
    from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
        KINETICS_MEAN, KINETICS_STD,
    )

    dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    mesh = data_mesh(1)
    cfg = x3d_config("M", n_classes=400)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mom = init_momentum(params)
    rng = np.random.RandomState(0)
    per_chip, frames, crop, splits = 32, 8, 224, 4
    batch = {
        "clip": jax.jit(jax.random.bits,
                        static_argnames=("shape", "dtype"))(
            jax.random.PRNGKey(1),
            shape=(per_chip, frames, crop, crop, 3), dtype=jnp.uint8),
        "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
        "label": jnp.asarray(rng.randint(0, 400, (per_chip,)).astype(
            np.int32)),
    }
    prng = jax.random.PRNGKey(42)
    lr = jnp.float32(0.1)

    print(f"# full step bucket (128,8,224,4) {dtype_name}", flush=True)
    for fused in (False, True):
        x3d_mod.set_pw_stats_epilogue(fused)
        loop = make_train_loop(
            cfg, mesh, num_steps=steps, loss="kinetics",
            compute_dtype=dtype,
            preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD),
            per_step_batches=False)
        p = jax.tree.map(jnp.copy, params)
        m = jax.tree.map(jnp.copy, mom)
        s = init_bn_state(cfg, splits)
        t0 = time.perf_counter()
        p, m, s, out = loop(p, m, s, batch, lr, prng, out_size=crop)
        print(f"  compile+warm: {time.perf_counter() - t0:.1f}s",
              flush=True)
        float(out.loss[-1])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            p, m, s, out = loop(p, m, s, batch, lr, prng, out_size=crop)
            final = float(out.loss[-1])
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"  pw_epilogue={fused!s:>5}: {best*1e3:7.1f} ms/step "
              f"(loss {final:.3f})", flush=True)
        del p, m, s
    x3d_mod.set_pw_stats_epilogue(False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--section", default="all",
                    choices=["isolated", "step", "all"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.section in ("isolated", "all"):
        bench_isolated(args.iters, dtype)
    if args.section in ("step", "all"):
        bench_step(args.steps, args.dtype)


if __name__ == "__main__":
    main()
