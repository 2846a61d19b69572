"""Kernel microbenchmarks on the real TPU: depthwise-conv implementations
(XLA vs the free-offset Pallas kernel in both layouts) at the X3D-M stage
shapes, and full-train-step comparisons across SubBN/dw-impl modes.

Methodology (docs/roofline.md): in-graph ``lax.fori_loop`` chains with
ITERS >= 64 per dispatch so the tunnel's ~40 ms dispatch+fetch round trip
is amortized; results forced with a ``float()`` fetch.

Run alone (ONE TPU client at a time): ``python tools/bench_kernels.py``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import importlib

# ops/__init__ re-exports a *function* named conv3d which shadows the
# submodule on attribute access — resolve the module explicitly.
conv_mod = importlib.import_module("x3d_multigrid_tpu.ops.conv3d")
subbn_mod = importlib.import_module("x3d_multigrid_tpu.ops.subbn")

# (N, T, H, W, C) stride-1 dw-conv shapes per X3D-M stage (fine bucket,
# per-chip batch 32 = global 128 / 4 chips)
STAGE_SHAPES = [
    (32, 8, 56, 56, 54),
    (32, 8, 28, 28, 108),
    (32, 8, 14, 14, 216),
    (32, 8, 7, 7, 432),
]


def _chain_time(make_step, x0, iters, label):
    """Time an in-graph fori_loop of ``iters`` applications of make_step."""
    @jax.jit
    def run(x):
        def body(_, carry):
            return make_step(carry)
        return jax.lax.fori_loop(0, iters, body, x)

    y = run(x0)
    _force(y)  # compile + warm
    t0 = time.perf_counter()
    y = run(x0)
    _force(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:>24}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def _force(tree):
    leaves = jax.tree.leaves(tree)
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def bench_dw(iters, dtype, impls=None):
    impls = impls or ("xla", "dense_diag", "pallas_nc", "pallas_packed")
    rng = np.random.RandomState(0)
    for shape in STAGE_SHAPES:
        n, t, h, w, c = shape
        x0 = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
        k = jnp.asarray(
            rng.randn(3, 3, 3, 1, c).astype(np.float32)).astype(dtype)
        print(f"# dw 3x3x3 s1 {shape} {jnp.dtype(dtype).name}", flush=True)

        for impl in impls:
            conv_mod.set_dw_impl(impl)

            def fwd_step(xx):
                y = conv_mod.depthwise_conv3d(xx, k)
                return y * 0.999  # keep the chain bounded

            def fwdbwd_step(xx):
                # sin wrap: a linear op under a sum loss has a CONSTANT
                # cotangent that XLA folds away; cos(conv(z)) forces the
                # real fwd + dx + dk computation every iteration
                gx, gk = jax.grad(
                    lambda z, kk: jnp.sum(jnp.sin(
                        conv_mod.depthwise_conv3d(z, kk)
                        .astype(jnp.float32))), argnums=(0, 1))(xx, k)
                return (xx - 1e-6 * gx.astype(xx.dtype)
                        + (1e-9 * jnp.sum(gk)).astype(xx.dtype))

            _chain_time(fwd_step, x0, iters, f"{impl} fwd")
            _chain_time(fwdbwd_step, x0, iters, f"{impl} fwd+bwd")
        conv_mod.set_dw_impl("xla")


def bench_subbn(iters, dtype):
    rng = np.random.RandomState(1)
    for shape in STAGE_SHAPES:
        n, t, h, w, c = shape
        x0 = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
        scale = jnp.ones((c,), jnp.float32).astype(dtype)
        bias = jnp.zeros((c,), jnp.float32).astype(dtype)
        st = {
            "split_mean": jnp.zeros((4, c), jnp.float32),
            "split_var": jnp.ones((4, c), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
        }
        print(f"# subbn S=4 {shape} {jnp.dtype(dtype).name}", flush=True)
        for mode in ("lanes", "cvjp"):
            subbn_mod.set_fused_train(mode)

            def fwdbwd_step(xx):
                g = jax.grad(lambda z: jnp.sum(jnp.sin(
                    subbn_mod.sub_batch_norm(
                        z, scale, bias, st, train=True)[0]
                    .astype(jnp.float32))))(xx)
                return xx - 1e-6 * g.astype(xx.dtype)

            _chain_time(fwdbwd_step, x0, iters, f"{mode} fwd+bwd")


def bench_full_step(steps, dtype_name, combos=None):
    """Full train step (fine bucket) across impl combos via make_train_loop."""
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
        "clip": jnp.asarray(rng.randint(
            0, 255, (per_chip, frames, crop, crop, 3), np.uint8)),
        "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
        "label": jnp.asarray(rng.randint(0, 400, (per_chip,)).astype(
            np.int32)),
    }
    prng = jax.random.PRNGKey(42)
    lr = jnp.float32(0.1)

    combos = combos or [("lanes", "xla"), ("cvjp", "xla")]
    print(f"# full step bucket (128,8,224,4) {dtype_name}", flush=True)
    for bn_mode, dw_mode in combos:
        subbn_mod.set_fused_train(bn_mode)
        conv_mod.set_dw_impl(dw_mode)
        loop = make_train_loop(
            cfg, mesh, num_steps=steps, loss="kinetics",
            compute_dtype=dtype,
            preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD),
            per_step_batches=False)
        p = jax.tree.map(jnp.copy, params)
        m = jax.tree.map(jnp.copy, mom)
        s = init_bn_state(cfg, splits)
        p, m, s, out = loop(p, m, s, batch, lr, prng, out_size=crop)
        float(out.loss[-1])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            p, m, s, out = loop(p, m, s, batch, lr, prng, out_size=crop)
            final = float(out.loss[-1])
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"  bn={bn_mode:>6} dw={dw_mode:>14}: {best*1e3:7.1f} "
              f"ms/step (loss {final:.3f})", flush=True)
        del p, m, s
    subbn_mod.set_fused_train("lanes")
    conv_mod.set_dw_impl("xla")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8,
                    help="steps per full-step loop")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--section", default="all",
                    choices=["all", "dw", "subbn", "step"])
    ap.add_argument("--impls", default=None,
                    help="comma-separated dw impls to bench "
                         "(default: all four)")
    ap.add_argument("--step-dw", default=None,
                    help="comma-separated dw impls for the full-step "
                         "section (default: xla with both bn modes)")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    if args.section in ("all", "dw"):
        bench_dw(args.iters, dtype,
                 impls=tuple(args.impls.split(",")) if args.impls else None)
    if args.section in ("all", "subbn"):
        bench_subbn(args.iters, dtype)
    if args.section in ("all", "step"):
        bench_full_step(
            args.steps, args.dtype,
            combos=[("lanes", d) for d in args.step_dw.split(",")]
            if args.step_dw else None)


if __name__ == "__main__":
    main()
