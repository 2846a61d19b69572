"""Benchmark: multigrid-weighted X3D-M training throughput (clips/s/chip).

Measures the full DP train step (fwd + bwd + SGD + SubBN stat updates) for
every multigrid shape bucket on synthetic data, then weights bucket step
times by each bucket's share of iterations in the reference short schedule
(replayed exactly via MultigridSchedule).  Per-chip batch = global batch / 4
to mirror the reference's 4-GPU per-device workload.

Baseline: ~23 clips/s/GPU on Titan RTX (BASELINE.md, derived from the
committed training log).  Prints one JSON line.
"""

import argparse
import collections
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.multigrid import (
    MultigridConfig, MultigridSchedule, enumerate_buckets,
)
from x3d_multigrid_tpu.parallel import data_mesh, make_train_step
from x3d_multigrid_tpu.train import init_momentum

BASELINE_CLIPS_PER_SEC_PER_GPU = 23.0
REFERENCE_GPUS = 4


def bucket_iteration_weights(cfg: MultigridConfig, epochs: int,
                             iters_per_epoch: int):
    """Exact share of schedule iterations per bucket_key."""
    sched = MultigridSchedule(cfg)
    counts = collections.Counter()
    for _ in range(epochs):
        for plan in sched.epoch(iters_per_epoch):
            counts[plan.bucket_key] += 1
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8,
                    help="timed steps per bucket")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--quick", action="store_true",
                    help="only bench 3 representative buckets")
    args = ap.parse_args()

    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    mcfg = MultigridConfig(
        base_batch_size=128, total_iterations=120 * (220000 // 128),
        sample_duration=80, crop_size=224, gamma_tau=10, base_bn_splits=4)
    buckets = enumerate_buckets(mcfg)
    weights = bucket_iteration_weights(mcfg, 120, 220000 // 128)

    if args.quick:
        buckets = sorted(buckets, key=lambda b: -weights[b.bucket_key])[:3]

    mesh = data_mesh(1)  # single-chip benchmark; per-chip share of the batch
    cfg = x3d_config("M", n_classes=400)
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    mom = init_momentum(params)

    total_clip_iters = 0.0
    total_time = 0.0
    per_bucket = {}
    for b in buckets:
        per_chip = b.batch_size // REFERENCE_GPUS
        bn_state = init_bn_state(cfg, num_splits=b.bn_splits)
        step = make_train_step(cfg, mesh, loss="kinetics", donate=False,
                               compute_dtype=compute_dtype)
        batch = {
            "clip": jnp.asarray(np.random.RandomState(0).rand(
                per_chip, b.frames, b.crop, b.crop, 3).astype(np.float32)),
            "label": jnp.asarray(np.random.RandomState(1).randint(
                0, 400, (per_chip,))),
        }
        rng = jax.random.PRNGKey(42)
        lr = jnp.float32(0.1)
        # compile + warmup
        p2, m2, s2, out = step(params, mom, bn_state, batch, lr, rng)
        jax.block_until_ready(out.loss)
        for _ in range(args.warmup - 1):
            p2, m2, s2, out = step(params, mom, bn_state, batch, lr, rng)
            jax.block_until_ready(out.loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            p2, m2, s2, out = step(params, mom, bn_state, batch, lr, rng)
        jax.block_until_ready(out.loss)
        dt = (time.perf_counter() - t0) / args.steps

        w = weights[b.bucket_key]
        clips_s = per_chip / dt
        per_bucket[str(b.bucket_key)] = round(clips_s, 1)
        total_clip_iters += w * per_chip
        total_time += w * dt
        print(f"# bucket B={per_chip}/chip T={b.frames} S={b.crop} "
              f"splits={b.bn_splits}: {dt*1e3:.1f} ms/step "
              f"{clips_s:.1f} clips/s/chip (weight {w})", flush=True)

    weighted = total_clip_iters / total_time
    print(json.dumps({
        "metric": "multigrid_train_clips_per_sec_per_chip",
        "value": round(weighted, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(weighted / BASELINE_CLIPS_PER_SEC_PER_GPU, 2),
        "detail": {"dtype": args.dtype, "per_bucket": per_bucket},
    }))


if __name__ == "__main__":
    main()
