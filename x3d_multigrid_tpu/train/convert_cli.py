"""Checkpoint converter CLI: reference ``.pt`` <-> framework ``.npz``.

The migration path for users of the reference repo (SURVEY §5.4: its
checkpoints are ``torch.save`` dicts with model/optimizer/scheduler state,
train_x3d_kinetics_multigrid.py:286-291).  This tool converts the model
weights both directions so reference checkpoints bootstrap training or
serving here, and framework checkpoints can be handed back to a torch
user:

    x3d-convert-ckpt ref_ckpt.pt out.npz            # .pt -> .npz
    x3d-convert-ckpt trained.npz out.pt             # .npz -> .pt

Model geometry (stage depths, channel widths, class count, BN split
count) is inferred from the ``.pt`` state dict itself; only S-vs-M is
ambiguous (identical weight shapes — they differ in input geometry only,
x3d.py:352-363) and defaults to ``--version M``.
"""

import argparse
import json
import sys

import numpy as np

from x3d_multigrid_tpu.models.x3d import _BLOCKS, x3d_config
from x3d_multigrid_tpu.train.checkpoint import (
    _check_reference_layout, from_torch_state_dict, load_checkpoint,
    momentum_from_torch_sgd, momentum_to_torch_sgd, save_checkpoint,
    scheduler_to_torch, strip_module_prefix, to_torch_state_dict,
    training_meta_from_torch,
)


def infer_config_from_state_dict(sd, version=None, task="class"):
    """Derive an :class:`X3DConfig` from a reference state dict's shapes.

    Accepts ``module.``-prefixed (DataParallel) saves; any other layout
    fails with a clear "not a reference X3D state dict" error instead of
    a raw ``KeyError`` mid-inference.
    """
    sd = strip_module_prefix(sd)
    _check_reference_layout(sd)
    blocks = []
    for stage in range(1, 5):
        n = 0
        while f"layer{stage}.{n}.conv1.weight" in sd:
            n += 1
        blocks.append(n)
    blocks = tuple(blocks)
    inplanes = []
    for stage in range(1, 5):
        # conv1 expands (prev-stage width -> expanded); conv3 projects
        # (expanded -> bottleneck) — so the pair is (conv1 out, conv3 out).
        expanded = int(np.asarray(sd[f"layer{stage}.0.conv1.weight"]).shape[0])
        bottleneck = int(np.asarray(sd[f"layer{stage}.0.conv3.weight"]).shape[0])
        inplanes.append((expanded, bottleneck))
    if version is None:
        matches = [v for v, b in _BLOCKS.items() if tuple(b) == blocks]
        # S and M share every weight shape; default to M (the flagship).
        version = "M" if "M" in matches else (matches[0] if matches else "M")
    n_classes = int(np.asarray(sd["fc2.weight"]).shape[0])
    fc1_dim = int(np.asarray(sd["fc1.weight"]).shape[0])
    kw = {}
    # Only override when the tables don't already say it (keeps configs
    # round-trippable through x3d_config(version)).
    ref = x3d_config(version)
    if blocks != tuple(ref.stage_blocks):
        kw["blocks_override"] = blocks
    if inplanes != list(ref.block_inplanes):
        kw["inplanes_override"] = tuple(inplanes)
    return x3d_config(version, n_classes=n_classes, fc1_dim=fc1_dim,
                      task=task, **kw)


def infer_bn_splits(sd) -> int:
    base = np.asarray(sd["bn1.bn.running_mean"]).shape[0]
    split = np.asarray(sd["bn1.split_bn.running_mean"]).shape[0]
    return max(1, split // base)


def _pt_to_npz(src, dst, version, task):
    import torch
    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    cfg = infer_config_from_state_dict(sd, version=version, task=task)
    params, bn_state = from_torch_state_dict(sd, cfg)
    meta = {"source": src, "version": cfg.version,
            "n_classes": cfg.n_classes, "task": cfg.task,
            "bn_splits": infer_bn_splits(sd)}
    # Optimizer momenta + scheduler step/LR state (reference resume set,
    # train_x3d_kinetics_multigrid.py:168-171,185-187) so a half-trained
    # reference run resumes here with its SGD state intact —
    # MultigridTrainer.restore() reads step/lr_lr/lr_base/long_ind.
    momentum = None
    if isinstance(ckpt, dict) and "optimizer_state_dict" in ckpt:
        momentum = momentum_from_torch_sgd(
            ckpt["optimizer_state_dict"], sd, cfg)
    if isinstance(ckpt, dict):
        meta.update(training_meta_from_torch(ckpt))
    if "step" in meta:
        # npz resume contract (MultigridTrainer.restore): iterations
        # default to step * num_steps_per_update, which the reference also
        # assumes (cur_iterations = steps * num_steps_per_update, :120)
        meta.setdefault("iterations", meta["step"])
    save_checkpoint(dst, params=params, bn_state=bn_state,
                    momentum=momentum, meta=meta)
    return {k: v for k, v in meta.items() if np.isscalar(v) or
            isinstance(v, (list, str))}


def _npz_to_pt(src, dst):
    import torch

    def tt(v):
        v = np.asarray(v)
        return torch.from_numpy(np.ascontiguousarray(v)) if v.ndim \
            else torch.tensor(v)

    ck = load_checkpoint(src)
    meta = ck.get("meta", {})
    sd = to_torch_state_dict(ck["params"], ck["bn_state"])
    out = {"model_state_dict": {k: tt(v) for k, v in sd.items()}}
    if "long_ind" in meta:
        out["long_ind"] = meta["long_ind"]
    if "momentum" in ck and "lr_lr" in meta:
        osd = momentum_to_torch_sgd(
            ck["momentum"], ck["bn_state"], lr=meta["lr_lr"],
            sgd_momentum=meta.get("sgd_momentum", 0.9),
            weight_decay=meta.get("weight_decay", 5e-5))
        for pid, st in osd["state"].items():
            st["momentum_buffer"] = tt(st["momentum_buffer"])
        out["optimizer_state_dict"] = osd
        out["scheduler_state_dict"] = scheduler_to_torch(
            int(meta.get("step", 0)), meta.get("milestones", ()),
            gamma=meta.get("gamma", 0.1),
            base_lr=meta.get("lr_base", meta["lr_lr"]),
            last_lr=meta["lr_lr"])
    torch.save(out, dst)
    return {"keys": len(sd),
            "optimizer_state": "optimizer_state_dict" in out,
            **{k: v for k, v in meta.items() if np.isscalar(v)}}


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert X3D checkpoints: reference .pt <-> .npz")
    ap.add_argument("src", help="input checkpoint (.pt or .npz)")
    ap.add_argument("dst", help="output checkpoint (.npz or .pt)")
    ap.add_argument("--version", default=None, choices=["S", "M", "XL"],
                    help="model version when converting .pt (S and M have "
                         "identical weight shapes; default M)")
    ap.add_argument("--task", default="class", choices=["class", "loc"])
    args = ap.parse_args(argv)

    pt_in = args.src.endswith((".pt", ".pth"))
    pt_out = args.dst.endswith((".pt", ".pth"))
    if pt_in and not pt_out:
        meta = _pt_to_npz(args.src, args.dst, args.version, args.task)
    elif pt_out and not pt_in:
        meta = _npz_to_pt(args.src, args.dst)
    else:
        sys.exit("exactly one side must be a .pt/.pth file "
                 f"(got {args.src} -> {args.dst})")
    print(json.dumps({"src": args.src, "dst": args.dst, "meta": meta}))


if __name__ == "__main__":
    main()
