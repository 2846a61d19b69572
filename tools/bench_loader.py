"""Host input-pipeline throughput bench: real JPEG fixtures, native reader.

Answers VERDICT #3: can the host loader feed the device at the benched
rates?  The reference's entire L2 (its forked multiprocess DataLoader,
dataloader.py:745-747, 12 workers + pinned memory) exists because JPEG
decode is the input bottleneck; this measures our replacement
(data/loader.py thread-pool + pipelined batch submission) end to end:

  1. builds a Kinetics-layout fixture tree of real JPEGs at 256 short side
     (synthetic but realistically compressible content, quality 87),
  2. replays the actual multigrid schedule through KineticsTrainLoader
     (native C++ decoder, adaptive per-bucket decode resolution),
  3. reports per-bucket clips/s + decodes/s on THIS host, the measured
     per-core decode rate, and — because bench hosts vary — the host core
     count needed to sustain a given device rate per bucket
     (cores = device_clips/s * decodes_per_clip / decodes_per_sec_per_core).

Usage: python tools/bench_loader.py [--iterations N] [--threads K]
       [--device-rates BENCH.json]   (prints one JSON line)
"""

import argparse
import collections
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x3d_multigrid_tpu.data.kinetics import VideoSample  # noqa: E402
from x3d_multigrid_tpu.data.loader import KineticsTrainLoader  # noqa: E402
from x3d_multigrid_tpu.data.reader import default_reader  # noqa: E402
from x3d_multigrid_tpu.data.spatial import train_scales  # noqa: E402
from x3d_multigrid_tpu.multigrid import (  # noqa: E402
    MultigridConfig, MultigridSchedule,
)

FIXTURE_DIR = "/tmp/x3d_loader_fixtures"


def make_fixtures(root: str = FIXTURE_DIR, n_videos: int = 24,
                  n_frames: int = 90, size=(340, 256), quality: int = 87):
    """Kinetics-layout frame folders of real JPEGs (256 short side).

    Content is low-frequency noise upsampled to full size — compresses to
    ~20-25 KB/frame like real video stills, so decode cost is realistic.
    """
    from PIL import Image
    samples = []
    rng = np.random.RandomState(0)
    for v in range(n_videos):
        vdir = os.path.join(root, "class_a", f"vid{v:04d}_000000_000010")
        done = os.path.join(vdir, ".complete")
        if not os.path.exists(done):
            os.makedirs(vdir, exist_ok=True)
            base = rng.randint(0, 255, (32, 42, 3), np.uint8)
            for t in range(n_frames):
                # evolve the content a little per frame
                base = np.clip(
                    base.astype(np.int16) +
                    rng.randint(-12, 13, base.shape), 0, 255
                ).astype(np.uint8)
                img = Image.fromarray(base).resize(size, Image.BILINEAR)
                img.save(os.path.join(vdir, f"frame_{t + 1:05d}.jpg"),
                         "JPEG", quality=quality)
            with open(done, "w"):
                pass
        samples.append(VideoSample(video=vdir, n_frames=n_frames,
                                   label=0, video_id=f"vid{v:04d}"))
    return samples


def measure_core_decode_rate(reader, samples, short_side: int = 256,
                             n: int = 150) -> float:
    """Single-thread decodes/s at full decode geometry (worst case)."""
    from x3d_multigrid_tpu.data.spatial import sample_train_crop_params
    path = os.path.join(samples[0].video, "frame_00001.jpg")
    rng = np.random.RandomState(0)
    scales = train_scales(224, [256.0, 256.0])
    # warm
    reader.clip_train([path], short_side, 224, scales, rng)
    t0 = time.perf_counter()
    for _ in range(n):
        reader.clip_train([path], short_side, 224, scales, rng)
    return n / (time.perf_counter() - t0)


def _cores_needed(device_per_bucket: dict, core_rate: float) -> dict:
    """Host cores per chip to sustain the device rate, per bucket.

    The loader is decode-bound (assembly/IO are <10% of batch time), so
    cores scale linearly with decode demand; adaptive decode makes sub-224
    crops ~(crop/224)^2 cheaper (libjpeg DCT scaling).
    """
    cores = {}
    for key_s, clips_per_s in device_per_bucket.items():
        key = tuple(int(v) for v in key_s.strip("()").split(","))
        frames_per_clip = key[1]
        rel_cost = (key[2] / 224.0) ** 2
        cores[key_s] = round(
            float(clips_per_s) * frames_per_clip * rel_cost / core_rate, 1)
    return cores


def _hosts_needed_v5e8(cores_per_chip: dict, host_cores: int) -> dict:
    """Input-host budget for a v5e-8 slice (8 chips on one host).

    For each bucket: decode cores for 8 chips / usable host cores, i.e.
    how many loader HOSTS (multi-process DP, parallel/multihost.py) must
    share the decode before one host process caps out.  >1.0 means the
    single-host ThreadPoolExecutor cannot feed 8 chips even with perfect
    core scaling, and multi-host input sharding (or the loader's
    executor='process' mode across NUMA domains) is required.
    """
    import math
    out = {}
    for key_s, cores in cores_per_chip.items():
        out[key_s] = round(8 * float(cores) / max(host_cores, 1), 2)
    out_max = max(out.values()) if out else 0.0
    return {"per_bucket": out, "max": out_max,
            "hosts": max(1, math.ceil(out_max)),
            "assumed_host_cores": host_cores}


def _epoch_rate(samples, schedule_cfg, *, threads, executor, iterations):
    """clips/s of one loader configuration over a schedule replay (the
    batch size is whatever ``schedule_cfg`` encodes)."""
    reader = default_reader()
    loader = KineticsTrainLoader(
        samples, MultigridSchedule(schedule_cfg), reader=reader,
        short_side=256, crop_size=224,
        scales=train_scales(224, [256.0, 256.0]), gamma_tau=10,
        num_threads=threads, executor=executor)
    n_clips = 0
    t0 = time.perf_counter()
    for batch in loader.epoch(iterations):
        n_clips += batch["clip"].shape[0]
    rate = n_clips / (time.perf_counter() - t0)
    loader.close()
    return rate


def run_loader_bench(*, iterations: int = 12, threads: int = 0,
                     videos: int = 24, batch_size: int = 128,
                     device_per_bucket: dict = None, quiet: bool = False,
                     scaling: bool = False, host_cores_v5e8: int = None):
    """Measure KineticsTrainLoader throughput; returns the result dict.

    ``scaling=True`` additionally measures the thread-count curve and the
    2-worker PROCESS-pool variant (loader executor='process') so the
    thread-vs-process question is answered with numbers, not GIL folklore.
    """
    threads = threads or max(os.cpu_count(), 1)
    host_cores_v5e8 = host_cores_v5e8 or int(
        os.environ.get("X3D_V5E8_HOST_CORES", 112))

    def say(msg):
        if not quiet:
            print(msg, flush=True)

    say(f"# building fixtures ({videos} videos x 90 frames, 340x256 q87)...")
    samples = make_fixtures(n_videos=videos)
    reader = default_reader()
    core_rate = measure_core_decode_rate(reader, samples)
    say(f"# single-core full-res decode rate: {core_rate:.0f} frames/s")

    mcfg = MultigridConfig(
        base_batch_size=batch_size,
        total_iterations=120 * (220000 // batch_size),
        sample_duration=80, crop_size=224, gamma_tau=10, base_bn_splits=4)
    schedule = MultigridSchedule(mcfg)
    loader = KineticsTrainLoader(
        samples, schedule, reader=reader, short_side=256, crop_size=224,
        scales=train_scales(224, [256.0, 256.0]), gamma_tau=10,
        num_threads=threads)

    per_bucket = collections.defaultdict(list)
    t_prev = time.perf_counter()
    n_clips = n_decodes = 0
    t_start = t_prev
    for batch in loader.epoch(iterations):
        t_now = time.perf_counter()
        plan = batch["plan"]
        b, t = batch["clip"].shape[:2]
        per_bucket[plan.bucket_key].append((t_now - t_prev, b, t))
        n_clips += b
        n_decodes += b * t
        t_prev = t_now
    wall = time.perf_counter() - t_start
    loader.close()

    detail = {}
    for key, entries in sorted(per_bucket.items()):
        dt = [e[0] for e in entries]
        b, t = entries[0][1], entries[0][2]
        clips_s = b / (sum(dt) / len(dt))
        detail[str(key)] = {
            "iters": len(entries), "batch": b, "frames_per_clip": t,
            "ms_per_batch": round(1e3 * sum(dt) / len(dt), 1),
            "clips_per_sec": round(clips_s, 1),
            "decodes_per_sec": round(clips_s * t, 1),
        }
        say(f"# bucket {key}: {detail[str(key)]}")

    result = {
        "metric": "loader_clips_per_sec",
        "value": round(n_clips / wall, 1),
        "unit": "clips/s (this host)",
        "detail": {
            "host_cores": os.cpu_count(),
            "threads": threads,
            "decodes_per_sec_total": round(n_decodes / wall, 1),
            "single_core_decode_rate": round(core_rate, 1),
            "per_bucket": detail,
        },
    }
    if scaling:
        # thread-count curve + 2-worker process-pool variant (short
        # replays; relative rates are what matter)
        it = max(iterations // 2, 4)
        curve = {}
        for k in sorted({1, 2, threads}):
            curve[f"threads_{k}"] = round(_epoch_rate(
                samples, mcfg, threads=k, executor="thread",
                iterations=it), 1)
            say(f"# scaling threads={k}: {curve[f'threads_{k}']} clips/s")
        curve["procs_2"] = round(_epoch_rate(
            samples, mcfg, threads=2, executor="process",
            iterations=it), 1)
        say(f"# scaling procs=2: {curve['procs_2']} clips/s")
        result["detail"]["scaling"] = curve

    if device_per_bucket:
        cores = _cores_needed(device_per_bucket, core_rate)
        result["detail"]["host_cores_needed_per_chip"] = cores
        result["detail"]["host_cores_needed_max"] = max(cores.values())
        result["detail"]["hosts_needed_v5e8"] = _hosts_needed_v5e8(
            cores, host_cores_v5e8)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=12,
                    help="schedule iterations to replay (mixed buckets)")
    ap.add_argument("--threads", type=int, default=max(os.cpu_count(), 1))
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=128,
                    help="base batch (the reference global batch is 128; "
                         "coarse buckets scale it x16)")
    ap.add_argument("--device-rates", default=None,
                    help="BENCH json with detail.per_bucket clips/s/chip "
                         "to compute required host cores per chip")
    ap.add_argument("--scaling", action="store_true",
                    help="measure the thread-count curve and the "
                         "2-process decode variant")
    ap.add_argument("--host-cores-v5e8", type=int, default=None,
                    help="usable cores on a v5e-8 input host (default "
                         "112, or X3D_V5E8_HOST_CORES)")
    args = ap.parse_args()

    device_rates = None
    if args.device_rates and os.path.exists(args.device_rates):
        with open(args.device_rates) as f:
            device_rates = json.load(f).get("detail", {}).get("per_bucket")

    result = run_loader_bench(
        iterations=args.iterations, threads=args.threads,
        videos=args.videos, batch_size=args.batch_size,
        device_per_bucket=device_rates, scaling=args.scaling,
        host_cores_v5e8=args.host_cores_v5e8)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
