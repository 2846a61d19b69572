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

Work order (budget-aware, evidence before coverage): buckets are measured
most-schedule-weight first; once the measured buckets cover >=80% of the
schedule weight, the eval block (3-view val + serving latency) runs BEFORE
the remaining low-weight buckets, so a slow run drops bucket coverage,
never the eval evidence.  The headline JSON line prints immediately after
the loop either way (round 2's rc=124 lesson).  Every stage of every
bucket prints its own wall time (setup/trace/lower/compile/run) plus a
cache hit/miss tag, so a budget overrun is attributable from the log.

Honesty: unmeasured buckets are estimated (committed per-bucket reference
table, ratio-scaled by this run's measurements — see estimate_step_times);
whenever any estimate contributes, the headline carries
``value_measured_only`` (weighted throughput over the measured buckets
alone) next to ``value``, and ``detail.estimated_buckets`` names them.

``--selfcheck`` compiles every program the default run needs and reports
which were missing from the persistent compile cache (and repairs them by
compiling).  Run it before a round snapshot: a warm cache is the
difference between a ~15 min full bench and a budget blowout.

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

# Persistent compilation cache: the 10 full-X3D-M bucket compiles cost
# ~40 s-4 min EACH through the TPU tunnel; with the cache warm (previous
# bench run or --selfcheck) they deserialize in seconds.  Threshold 0:
# cache EVERYTHING (incl. the per-shape uint8 generators and init
# programs) — on this rig the tunnel round trip dwarfs any local IO.
try:
    # CPU flow tests (JAX_PLATFORMS=cpu) go to the gitignored CPU cache so
    # they never drop x86 programs into the committed TPU cache dir.
    _default_cache = ("/root/repo/.jax_cache_cpu"
                      if os.environ.get("JAX_PLATFORMS") == "cpu"
                      else "/root/repo/.jax_cache")
    _cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _default_cache)
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception as e:  # cache is an optimization, never a requirement
    _cache_dir = None
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

# Committed per-bucket step times from the last full chip measurement;
# the estimator for budget-skipped buckets scales these by this run's
# measured/reference ratio (see estimate_step_times).
REFERENCE_TABLE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "docs", "artifacts", "bucket_ms_reference.json")

# --- persistent-cache hit/miss accounting (selfcheck + per-bucket tags) --
_CACHE_COUNTS = {"requests": 0, "hits": 0}

# --- live-key collection for --prune-stale ---------------------------------
# jax._src.lru_cache logs "Cache hit/miss for key: '<key>'" at DEBUG and
# names entry files "<key>-cache"; collecting the keys a selfcheck touches
# gives the exact live set, so stale programs (from before an HLO-changing
# edit) can be deleted instead of sitting in the committed cache forever.
_LIVE_KEYS = set()


class _KeyCollector(__import__("logging").Handler):
    _RE = __import__("re").compile(r"Cache (?:hit|miss) for key: '([^']+)'")

    def emit(self, record):
        try:
            m = self._RE.search(record.getMessage())
            if m:
                _LIVE_KEYS.add(m.group(1))
        except Exception:
            pass


def _install_key_collector():
    import logging
    lg = logging.getLogger("jax._src.lru_cache")
    lg.setLevel(logging.DEBUG)
    lg.propagate = False  # collect keys without spraying DEBUG to stderr
    lg.addHandler(_KeyCollector())


def prune_stale_cache_entries(cache_dir: str) -> dict:
    """Delete ``*-cache`` files whose keys were never requested this run."""
    import glob
    kept = freed_bytes = 0
    removed = []
    for path in glob.glob(os.path.join(cache_dir, "*-cache")):
        key = os.path.basename(path)[: -len("-cache")]
        if key in _LIVE_KEYS:
            kept += 1
        else:
            freed_bytes += os.path.getsize(path)
            removed.append(os.path.basename(path))
            os.unlink(path)
    return {"kept": kept, "removed": len(removed),
            "freed_mb": round(freed_bytes / 1e6, 1),
            "removed_sample": sorted(removed)[:8]}


def _cache_event_listener(event, **kwargs):
    if event == "/jax/compilation_cache/compile_requests_use_cache":
        _CACHE_COUNTS["requests"] += 1
    elif event == "/jax/compilation_cache/cache_hits":
        _CACHE_COUNTS["hits"] += 1


try:
    from jax._src import monitoring as _jax_monitoring
    _jax_monitoring.register_event_listener(_cache_event_listener)
except Exception:
    pass


class _CompileTag:
    """Classify one compile as hit/miss/uncached by diffing the cache
    event counters around it."""

    def __enter__(self):
        self._before = dict(_CACHE_COUNTS)
        return self

    def __exit__(self, *exc):
        req = _CACHE_COUNTS["requests"] - self._before["requests"]
        hit = _CACHE_COUNTS["hits"] - self._before["hits"]
        self.tag = ("uncached" if req == 0
                    else "hit" if hit >= req else "MISS")
        return False


def bucket_iteration_weights(cfg: MultigridConfig, epochs: int,
                             iters_per_epoch: int):
    """Exact share of schedule iterations per bucket_key."""
    sched = MultigridSchedule(cfg)
    counts = collections.Counter()
    for _ in range(epochs):
        for plan in sched.epoch(iters_per_epoch):
            counts[plan.bucket_key] += 1
    return counts


def warm_device_channels() -> dict:
    """Pay the tunnel's pathological first-round-trip costs UP FRONT,
    timed and reported, so no later stage silently absorbs them.

    Measured on this rig: the first device->host fetch of a process can
    stall 90-380 s (channel setup / server-side queue drain) while every
    subsequent fetch is milliseconds.  Anything that fetches mid-run —
    including MLIR constant embedding during lowering — would eat that
    penalty invisibly; paying it here makes it a line item instead."""
    t0 = time.perf_counter()
    x = jnp.ones((8,), jnp.float32)
    x.block_until_ready()
    first_put_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(x[0])
    first_fetch_s = time.perf_counter() - t0
    return {"first_put_s": round(first_put_s, 2),
            "first_fetch_s": round(first_fetch_s, 2)}


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

    The axon tunnel stages host arrays slowly and erratically, so
    host-built clip batches (tens to hundreds of MB) would dominate the
    bench's wall clock — and a real deployment stages over PCIe/DMA at
    GB/s, so the tunnel transfer is an artifact, not a cost worth
    measuring.  The timed programs take the batch as an argument either
    way; on-device generation changes where the bytes come from, not
    what is compiled.
    """
    return jax.jit(jax.random.bits, static_argnames=("shape", "dtype"))(
        key, shape=shape, dtype=jnp.uint8)


def load_reference_table(path: str = REFERENCE_TABLE_PATH):
    """Committed {bucket_key_str: ms_per_step} from the last full run."""
    try:
        with open(path) as f:
            doc = json.load(f)
        return {k: float(v) for k, v in doc["ms_per_step"].items()}
    except Exception:
        return {}


def estimate_step_times(measured, all_buckets, reference=None):
    """Per-bucket step time with provenance.

    Returns {bucket_key: (seconds, how)} where how is one of:
      'measured'          — timed this run;
      'reference_scaled'  — committed reference table entry, scaled by the
                            median(measured/reference) ratio over the
                            buckets measured this run (so a globally
                            faster/slower run shifts its estimates too);
      'cycle_mean'        — mean of this run's same-long-cycle
                            measurements (last resort; structurally biased
                            for large-crop buckets — r4 published a 3.8%
                            inflated headline this way, hence the table).
    """
    reference = reference if reference is not None else load_reference_table()
    ratios = [measured[k] / (reference[str(k)] / 1e3)
              for k in measured if str(k) in reference]
    scale = statistics.median(ratios) if ratios else 1.0
    out = {}
    for b in all_buckets:
        k = b.bucket_key
        if k in measured:
            out[k] = (measured[k], "measured")
        elif str(k) in reference:
            out[k] = (reference[str(k)] / 1e3 * scale, "reference_scaled")
        else:
            same_cycle = [t for kk, t in measured.items() if kk[3] == k[3]]
            pool = same_cycle or list(measured.values())
            out[k] = (sum(pool) / len(pool), "cycle_mean")
    return out


def weighted_throughput(times, weights, buckets):
    """Schedule-weighted clips/s/chip over the given buckets."""
    clip_iters = sum(weights[b.bucket_key] * (b.batch_size // REFERENCE_GPUS)
                     for b in buckets)
    total_time = sum(weights[b.bucket_key] * times[b.bucket_key]
                     for b in buckets)
    return clip_iters / total_time


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
    # device_u8).  Tiny mode shrinks the whole geometry INCLUDING the
    # output size so the CPU flow test never compiles full-res programs.
    b_clips, views, t, r, out_size = 64, 3, 16, 256, 224
    if tiny:
        b_clips, views, t, r, out_size = 4, 3, 4, 40, 32
    clips = device_u8(jax.random.PRNGKey(0),
                      (b_clips * views, t, r, r, 3))
    t0 = time.perf_counter()
    with _CompileTag() as tag:
        logits = eval_step(params, bn_state, clips, out_size=out_size)
    print(f"# eval_step compile [{tag.tag}]: "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    logits = eval_step(params, bn_state, clips, out_size=out_size)  # warm
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(steps):
        logits = eval_step(params, bn_state, clips, out_size=out_size)
    float(jnp.sum(logits))
    val_clips_s = b_clips * steps / (time.perf_counter() - t0)

    engine = InferenceEngine(
        params, bn_state, cfg,
        compute_dtype=compute_dtype or jnp.float32,
        crop_size=out_size)
    lat = {}
    for n_views in (1, 10):
        # Pre-staged on device: classify()'s jnp.asarray is then a no-op,
        # so the median below is the compiled fwd path, not tunnel IO.
        x = device_u8(jax.random.PRNGKey(n_views),
                      (1, n_views, t, r, r, 3))
        t0 = time.perf_counter()
        with _CompileTag() as tag:
            engine.classify(x)  # compile
        print(f"# classify v{n_views} compile [{tag.tag}]: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
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
    former is reported for honesty.  The emitted JSON is marked
    ``modeled: true`` — compute and decode rates are measured, but the
    reconciliation combines them with the two assumptions listed in
    ``assumptions``."""
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
        "modeled": True,
        "assumptions": [
            f"dc_h2d_gbps_per_chip={dc_gbps} (PCIe share, not measured "
            "here — the bench rig's tunnel rate is reported separately)",
            f"host_cores_per_chip={cores_per_chip}",
        ],
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
                         "rest — useful when every compile is cold")
    # --full became the default in r4; keep it as a hidden no-op for any
    # old driver script still passing it.
    ap.add_argument("--full", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--mode", default="loop", choices=["loop", "dispatch"],
                    help="loop (default): in-graph lax.scan of --steps SGD "
                         "steps, timed wall-clock with NO overhead "
                         "correction; dispatch: repeated jit dispatches "
                         "(pipelined, also uncorrected — measured equal to "
                         "loop within ~10%% on v5e)")
    ap.add_argument("--loop", dest="mode", action="store_const",
                    const="loop", help=argparse.SUPPRESS)
    ap.add_argument("--selfcheck", action="store_true",
                    help="compile every program the default run needs, "
                         "report cache hits/misses (and repair misses by "
                         "compiling), then exit — no timing")
    ap.add_argument("--prune-stale", action="store_true",
                    help="with --selfcheck: after the check, delete cache "
                         "entries whose keys were never requested by it "
                         "(stale programs from before an HLO-changing "
                         "edit; they would sit in the committed cache as "
                         "dead weight forever)")
    ap.add_argument("--with-eval", action="store_true",
                    help="re-print the eval section after the headline "
                         "(the eval block itself runs mid-loop by default)")
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
                         "that even when compiles miss the committed "
                         ".jax_cache (warm, the full 10-bucket loop + eval "
                         "fits well inside)")
    ap.add_argument("--eval-reserve", type=float, default=400.0,
                    help="headroom (s) required below --budget before "
                         "starting the eval block (covers its worst-case "
                         "cold compiles so it can never push the headline "
                         "past the driver kill window)")
    ap.add_argument("--tiny", action="store_true",
                    help="flow test: tiny model/geometry so the whole "
                         "bench (budget logic, JSON emission) runs in ~1 "
                         "min on CPU — the number is meaningless")
    args = ap.parse_args()
    if args.prune_stale:
        _install_key_collector()
    t_start = time.perf_counter()
    wall = {}  # stage -> seconds, printed and attached to detail

    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    t0 = time.perf_counter()
    jax.devices()
    wall["backend_init_s"] = round(time.perf_counter() - t0, 1)
    chan = warm_device_channels()
    wall.update(chan)
    print(f"# startup: backend {wall['backend_init_s']}s, first put "
          f"{chan['first_put_s']}s, first fetch {chan['first_fetch_s']}s",
          flush=True)

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
        # (T, bn_splits) family and both batch extremes
        picks = {(2048, 2, 111, 32), (1024, 2, 158, 32),
                 (1024, 4, 111, 16), (1024, 4, 112, 8),
                 (256, 4, 224, 8), (128, 8, 224, 4)}
        buckets = [b for b in buckets if b.bucket_key in picks]
    # default: ALL 10 buckets, measured most-schedule-weight first under
    # the budget guard — if the budget runs out, the buckets that dominate
    # the weighted headline are the ones actually measured.
    buckets = sorted(buckets, key=lambda b: -weights[b.bucket_key])

    mesh = data_mesh(1)  # single-chip benchmark; per-chip share of batch
    if args.tiny:
        cfg = x3d_config(
            "M", n_classes=13, blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32)
    else:
        cfg = x3d_config("M", n_classes=400)

    # Single-program initialization: init_params/init_momentum issue
    # hundreds of eager ops each — through the tunnel that was 89 s of
    # per-op round trips (measured r5); as ONE jitted program it's
    # seconds, and the program itself lands in the persistent cache.
    t0 = time.perf_counter()
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    mom = jax.jit(init_momentum)(params)
    jax.block_until_ready((params, mom))
    wall["init_s"] = round(time.perf_counter() - t0, 1)
    # one jitted copy program reused every bucket (donated inputs below)
    copy_state = jax.jit(lambda p, m: jax.tree.map(jnp.copy, (p, m)))

    # measured for the record only — NOT subtracted from step times (back-
    # to-back donated dispatches pipeline, so wall/step ~= compute; verified
    # against scan-loop timing on v5e)
    overhead = measure_dispatch_overhead()
    print(f"# dispatch+fetch round trip: {overhead*1e3:.1f} ms "
          f"(reported, not subtracted); init {wall['init_s']}s", flush=True)

    pp = (KINETICS_MEAN, KINETICS_STD)
    step_fn = make_train_step(cfg, mesh, loss="kinetics",
                              compute_dtype=compute_dtype,
                              preprocess_mean_std=pp, donate=True)

    if args.selfcheck:
        run_selfcheck(args, cfg, mesh, buckets, params, mom, pp,
                      compute_dtype, copy_state=copy_state)
        return

    all_buckets = enumerate_buckets(mcfg)
    measured = {}
    per_bucket = {}
    per_bucket_wall = {}
    skipped = []
    rng = np.random.RandomState(0)
    eval_detail = None
    eval_skipped_reason = None
    # the eval block runs once the measured buckets cover >=80% of the
    # schedule weight — BEFORE the low-weight tail, so a slow run drops
    # bucket coverage, never the eval evidence
    target_weight = 0.8 * sum(weights[b.bucket_key] for b in buckets)
    covered_weight = 0.0

    def maybe_run_eval():
        nonlocal eval_detail, eval_skipped_reason
        if eval_detail is not None or eval_skipped_reason is not None:
            return
        elapsed = time.perf_counter() - t_start
        if elapsed > args.budget - args.eval_reserve:
            eval_skipped_reason = (f"elapsed {elapsed:.0f}s > budget "
                                   f"{args.budget:.0f}s - reserve "
                                   f"{args.eval_reserve:.0f}s")
            print(f"# eval block skipped ({eval_skipped_reason})",
                  flush=True)
            return
        t0 = time.perf_counter()
        try:
            eval_detail = bench_eval(cfg, mesh, params, compute_dtype,
                                     tiny=args.tiny)
            print(f"# eval block: {time.perf_counter() - t0:.1f}s "
                  f"{eval_detail}", flush=True)
        except Exception as e:
            eval_skipped_reason = f"failed: {e!r}"
            print(f"# eval block failed: {e!r}", flush=True)

    for b in buckets:
        if covered_weight >= target_weight:
            maybe_run_eval()
        # Budget guard: a fresh bucket costs one compile (~40 s-4 min via
        # the tunnel when the cache is cold) + ~3 s of timed steps.  Leave
        # whatever we can't fit to the estimator rather than risk the
        # driver's rc=124 with no JSON line (round-2 failure).
        elapsed = time.perf_counter() - t_start
        if measured and elapsed > args.budget:
            skipped.append(str(b.bucket_key))
            print(f"# bucket {b.bucket_key}: SKIPPED (elapsed "
                  f"{elapsed:.0f}s > budget {args.budget:.0f}s)",
                  flush=True)
            continue
        stage = {}
        per_chip = b.batch_size // REFERENCE_GPUS
        t0 = time.perf_counter()
        bn_state = jax.jit(
            lambda: init_bn_state(cfg, num_splits=b.bn_splits))()
        # adaptive decode (data/loader.py): the host ships crops already at
        # the bucket's short-cycle size, so the device resize is a no-op.
        # Clip pixels generated on device (device_u8) — the coarse buckets
        # are ~19 MB of uint8 the timed program receives as an argument
        # either way.
        batch = {
            "clip": device_u8(
                jax.random.PRNGKey(1),
                (per_chip, b.frames, b.crop, b.crop, 3)),
            "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
            "label": jnp.asarray(
                rng.randint(0, cfg.n_classes, (per_chip,)
                            ).astype(np.int32)),
        }
        p2, m2 = copy_state(params, mom)
        s2 = bn_state
        jax.block_until_ready((batch, p2, m2))
        stage["setup"] = time.perf_counter() - t0
        prng = jax.random.PRNGKey(42)
        lr = jnp.float32(0.1)

        if args.mode == "loop":
            loop = make_train_loop(
                cfg, mesh, num_steps=args.steps, loss="kinetics",
                compute_dtype=compute_dtype, preprocess_mean_std=pp,
                per_step_batches=False)
            t0 = time.perf_counter()
            lowered = loop.trace(p2, m2, s2, batch, lr, prng,
                                 out_size=b.crop).lower()
            stage["trace_lower"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            with _CompileTag() as tag:
                compiled = lowered.compile()
            stage["compile"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            p2, m2, s2, out = compiled(p2, m2, s2, batch, lr, prng)
            final = float(out.loss[-1])  # warmup + fetch
            stage["warmup"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            per_step = 1e9
            for _ in range(2):
                tc = time.perf_counter()
                p2, m2, s2, out = compiled(p2, m2, s2, batch, lr, prng)
                final = float(out.loss[-1])
                per_step = min(per_step,
                               (time.perf_counter() - tc) / args.steps)
            stage["timed"] = time.perf_counter() - t0
        else:
            t0 = time.perf_counter()
            with _CompileTag() as tag:
                # compile + warmup (2 calls)
                for _ in range(2):
                    p2, m2, s2, out = step_fn(p2, m2, s2, batch, lr, prng,
                                              out_size=b.crop)
                final = float(out.loss)
            stage["compile"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                p2, m2, s2, out = step_fn(p2, m2, s2, batch, lr, prng,
                                          out_size=b.crop)
            final = float(out.loss)  # forces completion of the chain
            per_step = (time.perf_counter() - t0) / args.steps
            stage["timed"] = time.perf_counter() - t0
        del p2, m2, s2

        measured[b.bucket_key] = per_step
        covered_weight += weights[b.bucket_key]
        per_bucket[str(b.bucket_key)] = round(per_chip / per_step, 1)
        per_bucket_wall[str(b.bucket_key)] = {
            k: round(v, 1) for k, v in stage.items()}
        stages_str = " ".join(f"{k} {v:.1f}s" for k, v in stage.items())
        print(f"# bucket B={per_chip}/chip T={b.frames} S={b.crop} "
              f"splits={b.bn_splits}: {per_step*1e3:.1f} ms/step "
              f"{per_chip/per_step:.1f} clips/s/chip "
              f"(weight {weights[b.bucket_key]}, loss {final:.3f}) | "
              f"{stages_str} [compile {tag.tag}] | elapsed "
              f"{time.perf_counter() - t_start:.0f}s",
              flush=True)
    maybe_run_eval()  # quick/spanning/tiny runs reach here without firing

    times = estimate_step_times(measured, all_buckets)
    est_methods = {str(k): how for k, (_, how) in times.items()
                   if how != "measured"}
    weighted = weighted_throughput(
        {k: t for k, (t, _) in times.items()}, weights, all_buckets)
    measured_buckets = [b for b in all_buckets if b.bucket_key in measured]
    weighted_measured_only = (
        weighted_throughput(measured, weights, measured_buckets)
        if measured_buckets else 0.0)

    detail = {"dtype": args.dtype,
              "mode": "scan_loop" if args.mode == "loop" else "dispatch",
              "overhead_corrected": False,
              "dispatch_overhead_ms": round(overhead * 1e3, 1),
              "subbn_impl": str(subbn_mod.FUSED_TRAIN),
              "per_bucket": per_bucket}
    if skipped:
        detail["skipped_buckets"] = skipped
    if est_methods:
        detail["estimated_buckets"] = est_methods
    detail["cache"] = dict(_CACHE_COUNTS)
    detail["wall_s"] = wall
    detail["per_bucket_wall_s"] = per_bucket_wall
    detail["bucket_wall_s"] = round(time.perf_counter() - t_start, 1)
    if eval_detail is not None:
        detail["eval"] = eval_detail
    elif eval_skipped_reason is not None:
        detail["eval_skipped"] = eval_skipped_reason

    # Headline FIRST — everything below is optional garnish that must
    # never cost the driver its parsed result.
    headline = {
        "metric": "multigrid_train_clips_per_sec_per_chip",
        "value": round(weighted, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(weighted / BASELINE_CLIPS_PER_SEC_PER_GPU, 2),
        "detail": detail,
    }
    if est_methods:
        # any estimate contributed: publish the measured-only number too
        # so the headline can never silently carry estimator bias (the r4
        # lesson: +3.8% from a cycle-mean fill of one skipped bucket)
        headline["value_measured_only"] = round(weighted_measured_only, 2)
        headline["vs_baseline_measured_only"] = round(
            weighted_measured_only / BASELINE_CLIPS_PER_SEC_PER_GPU, 2)
    print(json.dumps(headline), flush=True)

    if args.with_eval and eval_detail is not None:
        print(f"# eval: {eval_detail}", flush=True)

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


def run_selfcheck(args, cfg, mesh, buckets, params, mom, pp, compute_dtype,
                  copy_state=None):
    """Compile every program the default bench needs; report which were
    missing from the persistent cache.  Misses are repaired as a side
    effect (the compile writes the cache), so running this before a round
    snapshot guarantees the driver bench runs warm."""
    from x3d_multigrid_tpu.models import init_bn_state as _init_bn

    report = []
    t_all = time.perf_counter()
    if copy_state is not None:
        # the bucket loop's per-bucket state copy is its own program
        with _CompileTag() as tag:
            jax.block_until_ready(copy_state(params, mom))
        report.append({"program": "jit_copy", "cache": tag.tag})
        print(f"# selfcheck jit_copy: {tag.tag}", flush=True)
    for b in buckets:
        per_chip = b.batch_size // REFERENCE_GPUS
        # one retry per bucket: the tunnel's remote_compile endpoint drops
        # connections sporadically (observed: 'response body closed before
        # all bytes were read' after 4 clean compiles) — a transient must
        # cost one bucket's retry, never the rest of the warm-up
        for attempt in (1, 2):
            try:
                bn_state = jax.jit(
                    lambda: _init_bn(cfg, num_splits=b.bn_splits))()
                batch = {
                    "clip": device_u8(jax.random.PRNGKey(1),
                                      (per_chip, b.frames, b.crop, b.crop,
                                       3)),
                    "flip": jnp.zeros((per_chip,), bool),
                    "label": jnp.zeros((per_chip,), jnp.int32),
                }
                loop = make_train_loop(
                    cfg, mesh, num_steps=args.steps, loss="kinetics",
                    compute_dtype=compute_dtype, preprocess_mean_std=pp,
                    per_step_batches=False)
                t0 = time.perf_counter()
                lowered = loop.trace(params, mom, bn_state, batch,
                                     jnp.float32(0.1),
                                     jax.random.PRNGKey(42),
                                     out_size=b.crop).lower()
                with _CompileTag() as tag:
                    lowered.compile()
                dt = time.perf_counter() - t0
                report.append({"program": f"jit_loop{b.bucket_key}",
                               "cache": tag.tag, "compile_s": round(dt, 1)})
                print(f"# selfcheck jit_loop {b.bucket_key}: {tag.tag} "
                      f"({dt:.1f}s)", flush=True)
                break
            except Exception as e:
                print(f"# selfcheck jit_loop {b.bucket_key}: attempt "
                      f"{attempt} failed: {e!r}", flush=True)
                if attempt == 2:
                    report.append({"program": f"jit_loop{b.bucket_key}",
                                   "cache": f"failed: {e!r}"})
    # eval programs (compiles inside print their own hit/miss tags)
    try:
        bench_eval(cfg, mesh, params, compute_dtype, steps=1,
                   tiny=args.tiny)
        report.append({"program": "eval_block", "cache": "see tags above"})
    except Exception as e:
        report.append({"program": "eval_block", "cache": f"failed: {e!r}"})
    missing = [r["program"] for r in report
               if r.get("cache", "").startswith(("MISS", "failed"))]
    out = {
        "metric": "cache_selfcheck",
        "programs": len(report),
        "missing": missing,
        "cache_counters": dict(_CACHE_COUNTS),
        "wall_s": round(time.perf_counter() - t_all, 1),
    }
    if args.prune_stale and _cache_dir:
        out["pruned"] = prune_stale_cache_entries(_cache_dir)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
