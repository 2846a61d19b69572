"""Standalone Kinetics multi-view evaluation from a checkpoint.

Reproduces the reference's val pass (3-view softmax-mean Top-1,
train_x3d_kinetics_multigrid.py:239-257) as its own CLI, usable with
either native ``.npz`` checkpoints or the reference's ``.pt`` weights —
the parity path for BASELINE config 1 (single/multi-clip center-crop
inference on shipped weights).

``--subset testing --crops 10 --dump preds.npz`` serves the reference's
unlabeled test split (kinetics.py:205-239 sliding 10-view windows over
``test/`` dirs scanned at kinetics.py:110-118): per-video mean-softmax
probabilities are written as ``video_ids`` + ``probs`` instead of scoring
against labels (which are -1 on that subset).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.models import x3d_config, aggregate_all_subbn
from x3d_multigrid_tpu.parallel import data_mesh, make_eval_step
from x3d_multigrid_tpu.evaluate import multiview_softmax_top1
from x3d_multigrid_tpu.train.checkpoint import (
    load_checkpoint, load_torch_checkpoint,
)
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KINETICS_MEAN, KINETICS_STD,
)
from x3d_multigrid_tpu.models.x3d import CROP_SIZE, GAMMA_TAU


def evaluate(params, bn_state, cfg, loader, *, crop_size, mesh=None,
             compute_dtype=None, log_every=50, collect_probs=False):
    """Multi-view Top-1 over an eval loader; returns accuracy.

    ``collect_probs=True`` additionally returns the per-video mean-softmax
    probabilities in loader (= sample) order — the prediction-dump path
    for the unlabeled test subset."""
    from x3d_multigrid_tpu.parallel.mesh import pad_to_multiple
    mesh = mesh or data_mesh(1)
    ndev = mesh.devices.size
    eval_step = make_eval_step(
        cfg, mesh, compute_dtype=compute_dtype,
        preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD))
    agg = aggregate_all_subbn(bn_state)
    correct = total = 0
    all_probs = []
    for i, batch in enumerate(loader):
        clips = batch["clip"]
        b, n = clips.shape[:2]
        flat = clips.reshape((b * n,) + clips.shape[2:])
        flat, n_real = pad_to_multiple(flat, ndev)
        logits = eval_step(params, agg, jnp.asarray(flat),
                           out_size=crop_size)
        probs, preds, _ = multiview_softmax_top1(logits[:n_real], n)
        valid = np.asarray(batch.get("valid", np.ones(b, bool)))
        hits = np.asarray(preds) == np.asarray(batch["label"])
        correct += int(np.sum(hits & valid))
        total += int(np.sum(valid))
        if collect_probs:
            all_probs.append(np.asarray(probs)[valid])
        if (i + 1) % log_every == 0:
            print(f"[eval] {total} clips, top1={correct/max(total,1):.4f}",
                  flush=True)
    acc = correct / max(total, 1)
    if collect_probs:
        return acc, np.concatenate(all_probs) if all_probs else \
            np.zeros((0, cfg.n_classes), np.float32)
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help=".npz checkpoint or reference .pt state dict")
    ap.add_argument("--root", required=True)
    ap.add_argument("--anno", required=True)
    ap.add_argument("--labels", required=True)
    ap.add_argument("--subset", default="validate")
    ap.add_argument("--version", default="M")
    ap.add_argument("--n-classes", type=int, default=400)
    ap.add_argument("--crops", type=int, default=3)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--short-side", type=int, default=256)
    ap.add_argument("--dtype", default="fp32", choices=["bf16", "fp32"])
    ap.add_argument("--dump", default=None, metavar="PREDS_NPZ",
                    help="write per-video mean-softmax probs "
                         "(video_ids, probs) — required for the unlabeled "
                         "testing subset, optional otherwise")
    args = ap.parse_args()

    cfg = x3d_config(args.version, n_classes=args.n_classes)
    if args.ckpt.endswith(".pt"):
        params, bn_state, _ = load_torch_checkpoint(args.ckpt, cfg)
        params = jax.tree.map(jnp.asarray, params)
        bn_state = jax.tree.map(jnp.asarray, bn_state)
    else:
        ck = load_checkpoint(args.ckpt)
        params = jax.tree.map(jnp.asarray, ck["params"])
        bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])

    from x3d_multigrid_tpu.data.kinetics import scan_kinetics
    from x3d_multigrid_tpu.data.loader import KineticsEvalLoader
    from x3d_multigrid_tpu.data.reader import default_reader

    gamma_tau = GAMMA_TAU[args.version]
    samples = scan_kinetics(args.root, args.anno, args.labels, args.subset,
                            min_frames=args.frames)
    loader = KineticsEvalLoader(
        samples, reader=default_reader(), short_side=args.short_side,
        gamma_tau=gamma_tau, frames=args.frames // gamma_tau,
        crops=args.crops, batch_size=args.batch_size)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    unlabeled = args.subset == "testing"
    if unlabeled and not args.dump:
        ap.error("--subset testing has no labels; give --dump to write "
                 "predictions")
    if args.dump:
        acc, probs = evaluate(
            params, bn_state, cfg, loader,
            crop_size=CROP_SIZE[args.version], compute_dtype=dtype,
            collect_probs=True)
        np.savez(args.dump,
                 video_ids=np.asarray([s.video_id for s in samples]),
                 probs=probs.astype(np.float32))
        print(f"wrote {probs.shape[0]} predictions "
              f"({args.crops}-view mean-softmax) to {args.dump}")
        if not unlabeled:
            print(f"Top-1 ({args.crops}-view): {acc:.4f} "
                  f"over {len(samples)} clips")
    else:
        acc = evaluate(params, bn_state, cfg, loader,
                       crop_size=CROP_SIZE[args.version],
                       compute_dtype=dtype)
        print(f"Top-1 ({args.crops}-view): {acc:.4f} "
              f"over {len(samples)} clips")


if __name__ == "__main__":
    main()
