"""Benchmark: multigrid-weighted X3D-M training throughput (clips/s/chip).

Measures the full DP training path — on-device uint8 preprocess (resize/
flip/normalize) + fwd + bwd + SGD + SubBN stat updates — for every
multigrid shape bucket, then weights bucket step times by each bucket's
exact share of iterations in the reference short schedule (replayed via
MultigridSchedule).  Per-chip batch = global batch / 4 to mirror the
reference's 4-GPU per-device workload.

Timing (honest, no corrections): the default times an in-graph
``lax.scan`` of ``--steps`` SGD steps per bucket — dispatch overhead is
amortized inside the program, wall/steps IS the step time.  ``--mode
dispatch`` times back-to-back donated dispatches instead; measured equal
to scan within ~10% on v5e because dispatches pipeline (the host enqueues
step k+1 while k executes), so neither mode subtracts anything.  The
trivial-dispatch round trip is printed for the record only.

The headline JSON line prints IMMEDIATELY after the bucket loop so the
driver always gets a parsed result even under a tight budget (round 2's
rc=124 lesson).  Buckets are measured most-schedule-weight first under a
wall-clock ``--budget``; unmeasured buckets are estimated from their long
cycle's mean step time.  The headline ``detail`` carries a compact
``eval`` block (3-view val throughput + BN-folded serving latency),
budget-guarded like the buckets; ``--with-loader`` appends the host
input-pipeline section after the JSON line (as ``#`` comment lines).

Baseline: ~23 clips/s/GPU on Titan RTX (BASELINE.md, derived from the
committed training log).  Prints one JSON line.
"""

import argparse
import collections
import json
import statistics
import time

import os

import jax

# Persistent compilation cache: the 6 full-X3D-M bucket compiles cost
# ~40 s-4 min EACH through the TPU tunnel; with the cache warm (previous
# bench run or the same round's smoke run) they deserialize in seconds.
try:
    # CPU flow tests (JAX_PLATFORMS=cpu) go to the gitignored CPU cache so
    # they never drop x86 programs into the committed TPU cache dir.
    _default_cache = ("/root/repo/.jax_cache_cpu"
                      if os.environ.get("JAX_PLATFORMS") == "cpu"
                      else "/root/repo/.jax_cache")
    _cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _default_cache)
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception as e:  # cache is an optimization, never a requirement
    print(f"# compilation cache unavailable: {e}", flush=True)

# The environment's sitecustomize pins jax_platforms to the TPU plugin via
# jax.config (which OUTRANKS the JAX_PLATFORMS env var).  Honor an explicit
# env override so `JAX_PLATFORMS=cpu python bench.py --tiny` flow-tests the
# budget/JSON plumbing without touching the chip.
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.ops import subbn as subbn_mod
from x3d_multigrid_tpu.multigrid import (
    MultigridConfig, MultigridSchedule, enumerate_buckets,
)
from x3d_multigrid_tpu.parallel import (
    data_mesh, make_train_step, make_train_loop,
)
from x3d_multigrid_tpu.train import init_momentum
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KINETICS_MEAN, KINETICS_STD,
)

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


def measure_dispatch_overhead(n: int = 12) -> float:
    """Median wall time of a trivial dispatch+fetch round trip."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x) + 1.0)
    float(f(x))  # compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def device_u8(key, shape):
    """Uniform uint8 tensor generated ON DEVICE.

    The axon tunnel stages host arrays at ~1 MB/s, so host-built clip
    batches (tens to hundreds of MB) would dominate the bench's wall
    clock — and a real deployment stages over PCIe/DMA at GB/s, so the
    tunnel transfer is an artifact, not a cost worth measuring.  The
    timed programs take the batch as an argument either way; on-device
    generation changes where the bytes come from, not what is compiled.
    """
    return jax.jit(jax.random.bits, static_argnames=("shape", "dtype"))(
        key, shape=shape, dtype=jnp.uint8)


def bench_eval(cfg, mesh, params, compute_dtype, *, steps: int = 6,
               tiny: bool = False):
    """3-view validation throughput + BN-folded serving latency
    (the reference's multi-view val path, kinetics.py:218-233, and
    the deployment InferenceEngine)."""
    from x3d_multigrid_tpu.models import init_bn_state
    from x3d_multigrid_tpu.parallel import make_eval_step
    from x3d_multigrid_tpu.serving import InferenceEngine

    pp = (KINETICS_MEAN, KINETICS_STD)
    bn_state = init_bn_state(cfg, num_splits=1)
    eval_step = make_eval_step(cfg, mesh, compute_dtype=compute_dtype,
                               preprocess_mean_std=pp)
    # Real recipe val geometry: frames//gamma_tau = 80//5 = 16-frame views,
    # recipe-scale batch (run() evals at batch_size=128 clips; 64 here keeps
    # device memory modest while saturating the chip — 192 views is 1.5x the
    # fine train bucket's element count).  Generated on device (see
    # device_u8: ~600 MB would take ~10 min through the tunnel).
    b_clips, views, t, r = 64, 3, 16, 256
    if tiny:
        b_clips, views, t, r = 4, 3, 4, 40
    clips = device_u8(jax.random.PRNGKey(0),
                      (b_clips * views, t, r, r, 3))
    for _ in range(2):  # compile + warm
        logits = eval_step(params, bn_state, clips, out_size=224)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(steps):
        logits = eval_step(params, bn_state, clips, out_size=224)
    float(jnp.sum(logits))
    val_clips_s = b_clips * steps / (time.perf_counter() - t0)

    engine = InferenceEngine(
        params, bn_state, cfg,
        compute_dtype=compute_dtype or jnp.float32)
    lat = {}
    for n_views in (1, 10):
        # Pre-staged on device: classify()'s jnp.asarray is then a no-op,
        # so the median below is the compiled fwd path, not tunnel IO.
        x = device_u8(jax.random.PRNGKey(n_views),
                      (1, n_views, t, r, r, 3))
        engine.classify(x)  # compile
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            engine.classify(x)
            times.append(time.perf_counter() - t0)
        lat[f"classify_ms_b1_v{n_views}"] = round(
            statistics.median(times) * 1e3, 1)
    return {"val_3view_clips_per_sec_per_chip": round(val_clips_s, 1), **lat}


def measure_h2d_bandwidth(mb: float = 3.0, reps: int = 3) -> dict:
    """Host->device staging bandwidth: timed ``device_put`` of a uint8
    buffer (the exact call the loader's staging path makes).  On this rig
    the transfer rides the axon tunnel — an artifact of the bench
    environment, reported as such; in a deployment the same call rides
    the host's PCIe link.  Both feed ``reconcile_end_to_end``."""
    n = int(mb * 1e6)
    buf = np.random.RandomState(0).randint(0, 256, (n,)).astype(np.uint8)
    jax.device_put(np.zeros(1024, np.uint8)).block_until_ready()  # setup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_put(buf).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return {"buffer_mb": round(mb, 2), "mb_per_s": round(n / best / 1e6, 2)}


def reconcile_end_to_end(weighted_clips_s: float, weights, all_buckets,
                         loader: dict, h2d: dict) -> dict:
    """ONE sustained clips/s/chip number WITH the data path in the loop.

    The training pipeline overlaps three stages (data/loader.py: decode
    pool -> prefetcher -> staging -> device step, each ahead of the
    next), so at steady state the sustained rate is the MINIMUM of the
    three stage rates, not their sum — the model the reference's 12-worker
    pinned-memory DataLoader (dataloader.py:745-747) embodies on GPU.

    Stage rates, all schedule-weighted over the 10 multigrid buckets:
      compute  — the measured bucket loop (the headline number);
      staging  — link MB/s / staged MB per clip (uint8 crops at bucket
                 geometry, adaptive decode having already downsized them);
      decode   — host cores/chip * measured per-core full-res decode
                 rate / full-res-equivalent decode demand per clip
                 (frames * (crop/224)^2, bench_loader's cost model).

    Staging is evaluated at BOTH the measured tunnel rate (bench-rig
    artifact) and a per-chip datacenter PCIe share
    (X3D_DC_H2D_GBPS_PER_CHIP, default 1.5 GB/s = conservative PCIe
    gen3 x16 split 8 ways); the end-to-end claim uses the latter, the
    former is reported for honesty."""
    dc_gbps = float(os.environ.get("X3D_DC_H2D_GBPS_PER_CHIP", 1.5))
    cores_per_chip = float(os.environ.get(
        "X3D_HOST_CORES_PER_CHIP",
        int(os.environ.get("X3D_V5E8_HOST_CORES", 112)) / 8))
    tot_clips = tot_bytes = tot_demand = 0.0
    for b in all_buckets:
        n = weights[b.bucket_key] * (b.batch_size // REFERENCE_GPUS)
        tot_clips += n
        tot_bytes += n * b.frames * b.crop * b.crop * 3
        tot_demand += n * b.frames * (b.crop / 224.0) ** 2
    mb_per_clip = tot_bytes / tot_clips / 1e6
    demand = tot_demand / tot_clips  # full-res-equivalent decodes/clip
    core_rate = loader["detail"]["single_core_decode_rate"]
    stage = {
        "compute": weighted_clips_s,
        "staging_dc": dc_gbps * 1e3 / mb_per_clip,
        "decode": cores_per_chip * core_rate / demand,
    }
    e2e = min(stage.values())
    return {
        "metric": "end_to_end_train_clips_per_sec_per_chip",
        "value": round(e2e, 1),
        "unit": "clips/s/chip (decode+staging+compute overlapped)",
        "vs_baseline": round(e2e / BASELINE_CLIPS_PER_SEC_PER_GPU, 2),
        "bottleneck": min(stage, key=stage.get),
        "stage_rates_clips_s": {k: round(v, 1) for k, v in stage.items()},
        "staged_mb_per_clip": round(mb_per_clip, 3),
        "decode_demand_fullres_frames_per_clip": round(demand, 1),
        "single_core_decode_fps": round(core_rate, 1),
        "host_cores_per_chip": cores_per_chip,
        "dc_h2d_gbps_per_chip_assumed": dc_gbps,
        "h2d_measured_tunnel": h2d,
        "staging_limited_clips_s_at_tunnel_rate": round(
            h2d["mb_per_s"] / mb_per_clip, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8,
                    help="timed steps per bucket")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--quick", action="store_true",
                    help="only bench 3 representative buckets")
    ap.add_argument("--spanning", action="store_true",
                    help="bench only the 6 corner buckets (one per "
                         "long-cycle/short-cycle extreme) and estimate the "
                         "rest from long-cycle means — the pre-r4 default, "
                         "useful when every compile is cold")
    ap.add_argument("--mode", default="loop", choices=["loop", "dispatch"],
                    help="loop (default): in-graph lax.scan of --steps SGD "
                         "steps, timed wall-clock with NO overhead "
                         "correction; dispatch: repeated jit dispatches "
                         "(pipelined, also uncorrected — measured equal to "
                         "loop within ~10%% on v5e)")
    ap.add_argument("--loop", dest="mode", action="store_const",
                    const="loop", help=argparse.SUPPRESS)
    ap.add_argument("--with-eval", action="store_true",
                    help="append the 3-view val / serving-latency section "
                         "AFTER the headline JSON line")
    ap.add_argument("--with-loader", action="store_true",
                    help="append the host input-pipeline section AFTER "
                         "the headline JSON line")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 1450)),
                    help="wall-clock budget (s) for the bucket loop; "
                         "remaining buckets are estimated, not measured. "
                         "Default 1450 s: the driver's observed kill window "
                         "is <= ~1800 s (round-2 rc=124 died ~3 buckets into "
                         "a cold run), so the JSON line must land before "
                         "that even when every compile misses the committed "
                         ".jax_cache (warm, the full 6-bucket loop runs in "
                         "well under the budget)")
    ap.add_argument("--tiny", action="store_true",
                    help="flow test: tiny model/geometry so the whole "
                         "bench (budget logic, JSON emission) runs in ~1 "
                         "min on CPU — the number is meaningless")
    args = ap.parse_args()
    t_start = time.perf_counter()

    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    if args.tiny:
        mcfg = MultigridConfig(
            base_batch_size=16, total_iterations=64, sample_duration=16,
            crop_size=32, gamma_tau=2, base_bn_splits=2)
        weights = bucket_iteration_weights(mcfg, 1, 64)
    else:
        mcfg = MultigridConfig(
            base_batch_size=128, total_iterations=120 * (220000 // 128),
            sample_duration=80, crop_size=224, gamma_tau=10,
            base_bn_splits=4)
        weights = bucket_iteration_weights(mcfg, 120, 220000 // 128)
    buckets = enumerate_buckets(mcfg)

    if args.tiny:
        pass  # keep every tiny bucket
    elif args.quick:
        buckets = sorted(buckets, key=lambda b: -weights[b.bucket_key])[:3]
    elif args.spanning:
        # one bucket per (long-cycle, extreme-short) corner: covers every
        # (T, bn_splits) family and both batch extremes; unmeasured buckets
        # get the mean ms/step of their long cycle (B*T*S^2 is ~constant,
        # so per-bucket step time varies little within a cycle)
        picks = {(2048, 2, 111, 32), (1024, 2, 158, 32),
                 (1024, 4, 111, 16), (1024, 4, 112, 8),
                 (256, 4, 224, 8), (128, 8, 224, 4)}
        buckets = [b for b in buckets if b.bucket_key in picks]
    # default: ALL 10 buckets, measured most-schedule-weight first under
    # the budget guard — with the committed .jax_cache warm the full loop
    # fits in well under the budget (r3 ran 6 buckets in 473 s), and a
    # cold run still lands the JSON with the heaviest buckets measured.
    # Most-schedule-weight first: if the budget runs out, the buckets that
    # dominate the weighted headline are the ones actually measured.
    buckets = sorted(buckets, key=lambda b: -weights[b.bucket_key])

    mesh = data_mesh(1)  # single-chip benchmark; per-chip share of batch
    if args.tiny:
        cfg = x3d_config(
            "M", n_classes=13, blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)
    else:
        cfg = x3d_config("M", n_classes=400)
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    mom = init_momentum(params)

    # measured for the record only — NOT subtracted from step times (back-
    # to-back donated dispatches pipeline, so wall/step ~= compute; verified
    # against scan-loop timing on v5e)
    overhead = measure_dispatch_overhead()
    print(f"# dispatch+fetch round trip: {overhead*1e3:.1f} ms "
          "(reported, not subtracted)", flush=True)

    pp = (KINETICS_MEAN, KINETICS_STD)
    step_fn = make_train_step(cfg, mesh, loss="kinetics",
                              compute_dtype=compute_dtype,
                              preprocess_mean_std=pp, donate=True)

    all_buckets = enumerate_buckets(mcfg)
    measured = {}
    per_bucket = {}
    skipped = []
    rng = np.random.RandomState(0)
    for b in buckets:
        # Budget guard: a fresh bucket costs one compile (~40 s-4 min via
        # the tunnel when the cache is cold) + ~3 s of timed steps.  Leave
        # whatever we can't fit to the long-cycle estimator rather than
        # risk the driver's rc=124 with no JSON line (round-2 failure).
        elapsed = time.perf_counter() - t_start
        if measured and elapsed > args.budget:
            skipped.append(str(b.bucket_key))
            print(f"# bucket {b.bucket_key}: SKIPPED (elapsed "
                  f"{elapsed:.0f}s > budget {args.budget:.0f}s)",
                  flush=True)
            continue
        per_chip = b.batch_size // REFERENCE_GPUS
        bn_state = init_bn_state(cfg, num_splits=b.bn_splits)
        # adaptive decode (data/loader.py): the host ships crops already at
        # the bucket's short-cycle size, so the device resize is a no-op.
        # Clip pixels generated on device (device_u8) — the coarse buckets
        # are ~19 MB of uint8, minutes of tunnel staging for bytes the
        # timed program receives as an argument either way.
        batch = {
            "clip": device_u8(
                jax.random.PRNGKey(1),
                (per_chip, b.frames, b.crop, b.crop, 3)),
            "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
            "label": jnp.asarray(
                rng.randint(0, cfg.n_classes, (per_chip,)
                            ).astype(np.int32)),
        }
        prng = jax.random.PRNGKey(42)
        lr = jnp.float32(0.1)

        p2 = jax.tree.map(jnp.copy, params)
        m2 = jax.tree.map(jnp.copy, mom)
        s2 = bn_state

        t_compile = time.perf_counter()
        if args.mode == "loop":
            loop = make_train_loop(
                cfg, mesh, num_steps=args.steps, loss="kinetics",
                compute_dtype=compute_dtype, preprocess_mean_std=pp,
                per_step_batches=False)
            p2, m2, s2, out = loop(p2, m2, s2, batch, lr, prng,
                                   out_size=b.crop)
            final = float(out.loss[-1])  # compile + warmup
            print(f"# compile+warmup {b.bucket_key}: "
                  f"{time.perf_counter() - t_compile:.1f}s", flush=True)
            per_step = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                p2, m2, s2, out = loop(p2, m2, s2, batch, lr, prng,
                                       out_size=b.crop)
                final = float(out.loss[-1])
                per_step = min(per_step,
                               (time.perf_counter() - t0) / args.steps)
        else:
            # compile + warmup (2 calls)
            for _ in range(2):
                p2, m2, s2, out = step_fn(p2, m2, s2, batch, lr, prng,
                                          out_size=b.crop)
            final = float(out.loss)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                p2, m2, s2, out = step_fn(p2, m2, s2, batch, lr, prng,
                                          out_size=b.crop)
            final = float(out.loss)  # forces completion of the chain
            per_step = (time.perf_counter() - t0) / args.steps
        del p2, m2, s2

        measured[b.bucket_key] = per_step
        per_bucket[str(b.bucket_key)] = round(per_chip / per_step, 1)
        print(f"# bucket B={per_chip}/chip T={b.frames} S={b.crop} "
              f"splits={b.bn_splits}: {per_step*1e3:.1f} ms/step "
              f"{per_chip/per_step:.1f} clips/s/chip "
              f"(weight {weights[b.bucket_key]}, loss {final:.3f})",
              flush=True)

    def est_time(b):
        if b.bucket_key in measured:
            return measured[b.bucket_key]
        same_cycle = [t for k, t in measured.items() if k[3] == b.bn_splits]
        pool = same_cycle or list(measured.values())
        return sum(pool) / len(pool)

    total_clip_iters = sum(
        weights[b.bucket_key] * (b.batch_size // REFERENCE_GPUS)
        for b in all_buckets)
    total_time = sum(weights[b.bucket_key] * est_time(b)
                     for b in all_buckets)
    weighted = total_clip_iters / total_time

    detail = {"dtype": args.dtype,
              "mode": "scan_loop" if args.mode == "loop" else "dispatch",
              "overhead_corrected": False,
              "dispatch_overhead_ms": round(overhead * 1e3, 1),
              "subbn_impl": str(subbn_mod.FUSED_TRAIN),
              "per_bucket": per_bucket}
    if skipped:
        detail["skipped_buckets"] = skipped
    detail["bucket_wall_s"] = round(time.perf_counter() - t_start, 1)

    # Eval block inside the headline detail: 3-view val throughput +
    # BN-folded serving latency (multi-view eval, kinetics.py:218-233).
    # Same budget guard as the bucket loop — a cold eval compile must
    # never delay the JSON line past the driver's kill window; warm (the
    # eval programs are in the committed .jax_cache) it costs seconds.
    if time.perf_counter() - t_start < args.budget:
        try:
            detail["eval"] = bench_eval(cfg, mesh, params, compute_dtype,
                                        tiny=args.tiny)
        except Exception as e:
            print(f"# eval block failed: {e!r}", flush=True)
    else:
        print("# eval block skipped (over budget)", flush=True)

    # Headline FIRST — everything below is optional garnish that must
    # never cost the driver its parsed result.
    print(json.dumps({
        "metric": "multigrid_train_clips_per_sec_per_chip",
        "value": round(weighted, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(weighted / BASELINE_CLIPS_PER_SEC_PER_GPU, 2),
        "detail": detail,
    }), flush=True)

    if args.with_eval:
        # the eval block now runs into detail["eval"] by default; this
        # flag re-prints it (or retries if the budget skipped it above)
        try:
            print(f"# eval: "
                  f"{detail.get('eval') or bench_eval(cfg, mesh, params, compute_dtype, tiny=args.tiny)}",
                  flush=True)
        except Exception as e:
            print(f"# eval section failed: {e!r}", flush=True)

    if args.with_loader:
        # host input pipeline: real JPEG decode throughput on this host +
        # cores needed per chip to feed the device at the rates above,
        # then the reconciled end-to-end number (compute + decode +
        # staging overlapped) as its own JSON line
        try:
            from tools.bench_loader import run_loader_bench
            loader = run_loader_bench(iterations=8, videos=16,
                                      device_per_bucket=per_bucket,
                                      quiet=True)
            print(f"# loader: {loader}", flush=True)
            h2d = measure_h2d_bandwidth()
            print(f"# h2d: {h2d}", flush=True)
            e2e = reconcile_end_to_end(weighted, weights, all_buckets,
                                       loader, h2d)
            print(json.dumps(e2e), flush=True)
        except Exception as e:
            print(f"# loader section failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
