"""Probe the stem's share of the thin-batch slowdown (roofline followup).

The r5 ablation (tools/ablate_step.py) attributed +7.9 ms of the
(256, 8, 158, 4)-vs-(512, 8, 112, 4) equal-elements gap to the STEM
(12.2 vs 4.3 ms stub-out delta).  The shipped stem is the s2d im2col
form (ops/conv3d.py::stem_spatial_conv), which was tuned on the
S=224 / per-chip-B=32 fine bucket where it wins ~1 ms over XLA's dense
conv.  Hypothesis: at other (B, S) points XLA's conv may win instead —
the im2col patch tensor (16*C_in channels) is pure extra traffic when
the conv itself is cheap.

This tool times the FULL train step (scan loop, bf16 — identical to
bench.py's timed program) at the three equal-elements shapes with
``set_stem_impl('im2col')`` vs ``set_stem_impl('xla')``, plus
cost-analysis bytes, so the stem choice can be made per-shape from
measurement rather than from the one tuned bucket.

Run on the chip: ``python tools/probe_stem.py [--steps 8]``
(one TPU client at a time).  Results land in docs/roofline.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        "/root/repo/.jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
import importlib

conv_mod = importlib.import_module("x3d_multigrid_tpu.ops.conv3d")
from x3d_multigrid_tpu.parallel import data_mesh, make_train_loop
from x3d_multigrid_tpu.train import init_momentum
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KINETICS_MEAN, KINETICS_STD,
)

# (per-chip batch, frames, crop, bn_splits) — the full 10-bucket set of
# the M-model short schedule (global batch / 4 replicas, bench.py), so
# the stem choice can be compared against the committed im2col table
# (docs/artifacts/bucket_ms_reference.json) bucket by bucket.
SHAPES = [
    (128, 8, 112, 4),   # fine-cycle baseline, 60.5 ms im2col
    (64, 8, 158, 4),    # slow bucket, stem ablation +7.9 ms
    (32, 8, 224, 4),    # slowest bucket, im2col's original tuning point
    (256, 2, 158, 32),
    (256, 4, 111, 16),
    (128, 4, 158, 16),
    (512, 2, 111, 32),
    (256, 4, 112, 8),
    (128, 4, 158, 8),
    (64, 4, 224, 8),
]


def device_u8(key, shape):
    return jax.jit(jax.random.bits, static_argnames=("shape", "dtype"))(
        key, shape=shape, dtype=jnp.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--only", type=int, nargs="*",
                    help="indices into SHAPES to probe")
    ap.add_argument("--impls", nargs="*", default=["im2col", "xla"],
                    help="stem impls to time (default: both; pass 'xla' "
                         "alone to compare against the committed im2col "
                         "table from the last full bench run)")
    args = ap.parse_args()

    mesh = data_mesh(1)
    cfg = x3d_config("M", n_classes=400)
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    mom = jax.jit(init_momentum)(params)
    jax.block_until_ready((params, mom))
    copy_state = jax.jit(lambda p, m: jax.tree.map(jnp.copy, (p, m)))
    pp = (KINETICS_MEAN, KINETICS_STD)
    rng = np.random.RandomState(0)

    shapes = [SHAPES[i] for i in args.only] if args.only else SHAPES
    rows = []
    for per_chip, t, s, splits in shapes:
        bn = jax.jit(lambda: init_bn_state(cfg, num_splits=splits))()
        batch = {
            "clip": device_u8(jax.random.PRNGKey(1),
                              (per_chip, t, s, s, 3)),
            "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
            "label": jnp.asarray(rng.randint(
                0, cfg.n_classes, (per_chip,)).astype(np.int32)),
        }
        for impl in args.impls:
            conv_mod.set_stem_impl(impl)
            loop = make_train_loop(
                cfg, mesh, num_steps=args.steps, loss="kinetics",
                compute_dtype=jnp.bfloat16, preprocess_mean_std=pp,
                per_step_batches=False)
            t0 = time.perf_counter()
            compiled = loop.trace(
                params, mom, bn, batch, jnp.float32(0.1),
                jax.random.PRNGKey(42), out_size=s).lower().compile()
            compile_s = time.perf_counter() - t0
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = ca.get("bytes accessed", 0.0) / 1e9  # per-step (scan
            # body counted once — see tools/probe_gap.py note)
            p2, m2 = copy_state(params, mom)
            # fresh copy per variant: the compiled loop donates bn state
            s2 = jax.jit(lambda b: jax.tree.map(jnp.copy, b))(bn)
            p2, m2, s2, out = compiled(p2, m2, s2, batch,
                                       jnp.float32(0.1),
                                       jax.random.PRNGKey(42))
            float(out.loss[-1])  # warmup
            best = 1e9
            for _ in range(2):
                tc = time.perf_counter()
                p2, m2, s2, out = compiled(p2, m2, s2, batch,
                                           jnp.float32(0.1),
                                           jax.random.PRNGKey(42))
                float(out.loss[-1])
                best = min(best, (time.perf_counter() - tc) / args.steps)
            del p2, m2, s2
            row = {"shape": (per_chip, t, s, splits), "stem": impl,
                   "measured_ms": round(best * 1e3, 1),
                   "gb_per_step": round(gb, 2),
                   "compile_s": round(compile_s, 1)}
            rows.append(row)
            print(row, flush=True)
    conv_mod.set_stem_impl("im2col")

    print("\n=== summary (full step, per step) ===")
    for r in rows:
        print(f"B={r['shape'][0]:4d} T={r['shape'][1]} S={r['shape'][2]:3d}"
              f" stem={r['stem']:6s} | {r['measured_ms']:6.1f} ms"
              f" | {r['gb_per_step']:6.2f} GB")


if __name__ == "__main__":
    main()
