"""Step-time attribution: time the X3D-M train step with individual op
families stubbed out (depthwise convs, SubBN stats, SE, preprocessing) to
see where the milliseconds go.  Substitution happens by monkeypatching the
op symbols the model module resolved at import — cost attribution only,
not a correctness mode.

Run on one TPU chip: ``python tools/ablate_step.py [--bucket 128,8,224,4]``
(single client at a time; see .claude/skills/verify/SKILL.md gotchas).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import x3d_multigrid_tpu.models.x3d as mx
from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.parallel import data_mesh, make_train_step
from x3d_multigrid_tpu.train import init_momentum
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KINETICS_MEAN, KINETICS_STD,
)

CANONICAL_CROP = 224

_ORIG = {
    "depthwise_conv3d": mx.depthwise_conv3d,
    "sub_batch_norm": mx.sub_batch_norm,
    "swish": mx.swish,
}


def _identity_dw(x, w, *, spatial_stride=1, padding=(1, 1, 1)):
    del w, padding
    if spatial_stride != 1:
        x = x[:, :, ::spatial_stride, ::spatial_stride, :]
    return x


def _affine_only_bn(x, scale, bias, state, *, train, momentum=0.1,
                    eps=1e-5):
    del train, momentum, eps
    return x * scale.astype(x.dtype) + bias.astype(x.dtype), state


def _restore():
    for k, v in _ORIG.items():
        setattr(mx, k, v)


VARIANTS = {
    "full": {},
    "no_dw_conv": {"depthwise_conv3d": _identity_dw},
    "no_bn_stats": {"sub_batch_norm": _affine_only_bn},
    "no_dw_no_bn": {"depthwise_conv3d": _identity_dw,
                    "sub_batch_norm": _affine_only_bn},
}


def time_variant(name, patches, *, per_chip, frames, crop, splits, steps,
                 dtype):
    _restore()
    for k, v in patches.items():
        setattr(mx, k, v)
    mesh = data_mesh(1)
    cfg = x3d_config("M", n_classes=400)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mom = init_momentum(params)
    bn = init_bn_state(cfg, splits)
    step = make_train_step(cfg, mesh, loss="kinetics", compute_dtype=dtype,
                           preprocess_mean_std=(KINETICS_MEAN,
                                                KINETICS_STD))
    rng = np.random.RandomState(0)
    batch = {
        "clip": jnp.asarray(rng.randint(
            0, 255, (per_chip, frames, CANONICAL_CROP, CANONICAL_CROP, 3),
            np.uint8)),
        "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
        "label": jnp.asarray(rng.randint(0, 400, (per_chip,)).astype(
            np.int32)),
    }
    prng = jax.random.PRNGKey(1)
    lr = jnp.float32(0.1)
    p, m, s = params, mom, bn
    for _ in range(2):  # compile + warmup
        p, m, s, out = step(p, m, s, batch, lr, prng, out_size=crop)
    float(out.loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, m, s, out = step(p, m, s, batch, lr, prng, out_size=crop)
    float(out.loss)
    per_step = (time.perf_counter() - t0) / steps
    print(f"{name:>14}: {per_step*1e3:7.1f} ms/step", flush=True)
    _restore()
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="128,8,224,4",
                    help="global_batch,frames,crop,splits")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = ap.parse_args()
    gb, frames, crop, splits = map(int, args.bucket.split(","))
    per_chip = gb // 4
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    results = {}
    for name, patches in VARIANTS.items():
        results[name] = time_variant(
            name, patches, per_chip=per_chip, frames=frames, crop=crop,
            splits=splits, steps=args.steps, dtype=dtype)

    full = results["full"]
    print(f"\n# attribution (bucket {args.bucket}, per-chip {per_chip}):")
    print(f"  dw convs : {(full - results['no_dw_conv'])*1e3:7.1f} ms")
    print(f"  bn stats : {(full - results['no_bn_stats'])*1e3:7.1f} ms")
    print(f"  residual : {results['no_dw_no_bn']*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
