"""Probe the 2x equal-elements gap (VERDICT r4 weak #3).

Three fine-cycle buckets carry the same ~12.8M uint8 clip elements per
step — and the same per-stage activation volume (B*T*H*W is conserved
through every stride) — yet measure 2x apart on the chip:

    (512, 8, 112, 4)  per-chip B=128   59.8 ms/step   (BENCH_r04)
    (256, 8, 158, 4)  per-chip B=64   107.0 ms/step
    (128, 8, 224, 4)  per-chip B=32   118.6 ms/step

This tool separates the two candidate explanations:

  * TRAFFIC — XLA's post-fusion HLO touches more bytes at the larger
    spatial sizes (padding to tile boundaries, halo re-reads, different
    fusion choices).  Read directly from ``compiled.cost_analysis()``.
  * UTILIZATION — same bytes, worse achieved bandwidth (thin batch, poor
    tiling of odd spatial sizes like 158).  Shows up as measured time
    exceeding the cost-model-implied HBM time.

It also times two HYPOTHETICAL padded shapes (S=160 for the 158 bucket,
S=256 for 224) to see whether pad-to-TPU-friendly-size with masked
BN/pool (SURVEY §7's odd-crop hard part) is worth building: the padded
run does ~2.5%/14% extra work, so a large speedup at equal semantics
means the lever is real.

Run on the chip: ``python tools/probe_gap.py [--steps 8] [--skip-timing]``
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
from x3d_multigrid_tpu.parallel import data_mesh, make_train_loop
from x3d_multigrid_tpu.train import init_momentum
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KINETICS_MEAN, KINETICS_STD,
)

# (per-chip batch, frames, crop, bn_splits, note)
SHAPES = [
    (128, 8, 112, 4, "fine-cycle baseline, 59.8 ms r4"),
    (64, 8, 158, 4, "equal elements, 107 ms r4"),
    (32, 8, 224, 4, "equal elements, 118.6 ms r4"),
    (64, 8, 160, 4, "158 padded to 160 (+2.5% work)"),
    (32, 8, 256, 4, "224 padded to 256 (+31% work)"),
    (64, 8, 112, 4, "half-batch control (expect ~30 ms if B-linear)"),
    (128, 8, 160, 4, "full-batch S=160 (2x elements of baseline)"),
]


def device_u8(key, shape):
    return jax.jit(jax.random.bits, static_argnames=("shape", "dtype"))(
        key, shape=shape, dtype=jnp.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--skip-timing", action="store_true",
                    help="cost analysis only (no warm-up/timed runs)")
    ap.add_argument("--only", type=int, nargs="*",
                    help="indices into SHAPES to probe")
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
    for per_chip, t, s, splits, note in shapes:
        bn = jax.jit(lambda: init_bn_state(cfg, num_splits=splits))()
        batch = {
            "clip": device_u8(jax.random.PRNGKey(1),
                              (per_chip, t, s, s, 3)),
            "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
            "label": jnp.asarray(rng.randint(
                0, cfg.n_classes, (per_chip,)).astype(np.int32)),
        }
        loop = make_train_loop(
            cfg, mesh, num_steps=args.steps, loss="kinetics",
            compute_dtype=jnp.bfloat16, preprocess_mean_std=pp,
            per_step_batches=False)
        t0 = time.perf_counter()
        lowered = loop.trace(params, mom, bn, batch, jnp.float32(0.1),
                             jax.random.PRNGKey(42), out_size=s).lower()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        # XLA's cost analysis counts a while/scan BODY ONCE, not x trip
        # count (verified: the 8-step scan program reports the same
        # bytes as tools/cost_analysis.py's single-step program, e.g.
        # 90.6 vs 90.4 GB at (32,8,224,4)), so the raw numbers ARE
        # per-step already.
        gb = ca.get("bytes accessed", 0.0) / 1e9
        tflop = ca.get("flops", 0.0) / 1e12
        implied_ms = gb / 819.0 * 1e3  # v5e ~819 GB/s HBM
        row = {"shape": (per_chip, t, s, splits), "note": note,
               "gb_per_step": round(gb, 2),
               "tflop_per_step": round(tflop, 3),
               "implied_hbm_ms": round(implied_ms, 1),
               "compile_s": round(compile_s, 1)}
        if not args.skip_timing:
            p2, m2 = copy_state(params, mom)
            s2 = bn
            t0 = time.perf_counter()
            p2, m2, s2, out = compiled(p2, m2, s2, batch,
                                       jnp.float32(0.1),
                                       jax.random.PRNGKey(42))
            float(out.loss[-1])
            row["warmup_s"] = round(time.perf_counter() - t0, 1)
            best = 1e9
            for _ in range(2):
                tc = time.perf_counter()
                p2, m2, s2, out = compiled(p2, m2, s2, batch,
                                           jnp.float32(0.1),
                                           jax.random.PRNGKey(42))
                float(out.loss[-1])
                best = min(best,
                           (time.perf_counter() - tc) / args.steps)
            row["measured_ms"] = round(best * 1e3, 1)
            row["hbm_frac"] = round(implied_ms / (best * 1e3), 2)
            del p2, m2, s2
        rows.append(row)
        print(row, flush=True)

    print("\n=== summary (per step) ===")
    for r in rows:
        meas = f"{r.get('measured_ms', '—')} ms"
        print(f"B={r['shape'][0]:4d} T={r['shape'][1]} S={r['shape'][2]:3d}"
              f" | {r['gb_per_step']:6.2f} GB {r['tflop_per_step']:.3f} TF"
              f" | implied {r['implied_hbm_ms']:6.1f} ms | {meas:>10} "
              f"| {r['note']}")


if __name__ == "__main__":
    main()
