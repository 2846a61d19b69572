"""Sustained end-to-end smoke run: the REAL data path on the chip.

Generates a miniature class-coded Kinetics frame-folder dataset on local
disk, then drives the real recipe loop — disk scan -> JPEG decode pool ->
prefetcher -> device_put staging -> fused device preprocess -> train
step — and leaves the per-epoch ``sustained`` JSONL events (wall-clock
clips/s with the data path in the loop) in OUT_DIR/train_log.jsonl.
docs/throughput_e2e.md's validation section reads its numbers from this
run.

Tiny geometry on purpose: through the bench rig's ~1 MB/s tunnel staging
a full-geometry batch would never arrive (the rig artifact the e2e doc
reconciles around); 32x32xT=8 uint8 clips keep staging to ~0.4 MB per
batch so the OVERLAP machinery (decode ahead of staging ahead of the
step) is what's being validated, not the tunnel.

Run: python tools/sustained_smoke.py [--epochs 4] [--out /tmp/sustained]
(one TPU client at a time).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--out", default="/tmp/sustained_smoke")
    args = ap.parse_args()

    from x3d_multigrid_tpu.data.synthetic import make_fake_kinetics
    from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
        KineticsRecipe, run,
    )

    root, anno, labels = make_fake_kinetics(
        os.path.join(args.out, "kin"), n_classes=3, videos_per_class=4,
        val_videos_per_class=3, n_frames=40, frame_size=(56, 44),
        class_coded=True)

    recipe = KineticsRecipe(
        version="M", n_classes=3,
        batch_size=8, max_epochs=args.epochs,
        dataset_size=80,  # 10 iterations/epoch (sampler loops videos)
        frames=16, crop_size_override=32, gamma_tau_override=2,
        short_side=40, base_bs_per_replica=1, const_bn_size=1,
        warmup_steps=0, init_lr=0.02,
        train_epochs_per_val=args.epochs, ckpt_every_steps=10_000,
        out_dir=os.path.join(args.out, "out"),
        num_devices=jax.local_device_count(), compute_dtype="bf16",
        model_overrides=dict(
            blocks_override=(1, 1, 1, 1),
            inplanes_override=((12, 8), (16, 8), (24, 16), (32, 16)),
            fc1_dim=32))

    run(recipe, train_root=root, train_anno=anno,
        val_root=root, val_anno=anno, labels=labels, precompile=False)

    with open(os.path.join(recipe.out_dir, "train_log.jsonl")) as f:
        events = [json.loads(l) for l in f]
    sustained = [e for e in events if e.get("event") == "sustained"]
    print("\n=== sustained events (clips/s with data in the loop) ===")
    for e in sustained:
        print(json.dumps(e))


if __name__ == "__main__":
    main()
