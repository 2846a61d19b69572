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
import x3d_multigrid_tpu.parallel.train_step as ts
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
    "conv3d": mx.conv3d,
    "stem_spatial_conv": mx.stem_spatial_conv,
    "temporal_depthwise_conv": mx.temporal_depthwise_conv,
    "pointwise_conv3d": mx.pointwise_conv3d,
    "_bottleneck": mx._bottleneck,
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


def _identity_swish(x):
    return x


def _cheap_stem_conv(x, w, *, stride=2):
    """Stand-in for the stem conv1_s: strided subsample + channel tile
    (keeps downstream shapes, removes the 3-channel dense conv cost)."""
    cout = w.shape[-1]
    y = x[:, :, ::stride, ::stride, :]
    reps = -(-cout // y.shape[-1])
    y = jnp.tile(y, (1, 1, 1, 1, reps))[..., :cout]
    return y * jnp.mean(w)  # keep w in the graph


def _identity_tconv(x, w):
    return x * (1.0 + 0.0 * jnp.mean(w).astype(x.dtype))


def _no_se_bottleneck_patch():
    """Disable SE by monkeypatching has_se handling: easiest is to patch
    pointwise_conv3d?  Instead patch _bottleneck via functools wrapper."""
    orig = mx._bottleneck

    def patched(blk_p, blk_s, x, *, has_se, train, momentum):
        return orig(blk_p, blk_s, x, has_se=False, train=train,
                    momentum=momentum)
    return patched


VARIANTS = {
    "full": {},
    "no_dw_conv": {"depthwise_conv3d": _identity_dw},
    "no_bn_stats": {"sub_batch_norm": _affine_only_bn},
    "no_dw_no_bn": {"depthwise_conv3d": _identity_dw,
                    "sub_batch_norm": _affine_only_bn},
    "no_se": {"_bottleneck": "NO_SE"},
    "no_swish": {"swish": _identity_swish},
    "no_stem": {"stem_spatial_conv": _cheap_stem_conv,
                "temporal_depthwise_conv": _identity_tconv},
    "no_preprocess": {},  # handled via preprocess=None + float input
    "remat": {},          # cfg.remat = True
    "remat_convs": {},    # cfg.remat = "convs" (save conv outs only)
}


def _restore():
    for k, v in _ORIG.items():
        setattr(mx, k, v)


def time_variant(name, patches, *, per_chip, frames, crop, splits, steps,
                 dtype):
    _restore()
    for k, v in patches.items():
        if k == "_bottleneck":
            setattr(mx, k, _no_se_bottleneck_patch())
        else:
            setattr(mx, k, v)
    mesh = data_mesh(1)
    remat = {"remat": True, "remat_convs": "convs"}.get(name, False)
    cfg = x3d_config("M", n_classes=400, remat=remat)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mom = init_momentum(params)
    bn = init_bn_state(cfg, splits)
    pp = (None if name == "no_preprocess"
          else (KINETICS_MEAN, KINETICS_STD))
    step = make_train_step(cfg, mesh, loss="kinetics", compute_dtype=dtype,
                           preprocess_mean_std=pp)
    rng = np.random.RandomState(0)
    if name == "no_preprocess":
        batch = {
            "clip": jnp.asarray(rng.rand(
                per_chip, frames, crop, crop, 3).astype(np.float32)),
            "label": jnp.asarray(rng.randint(0, 400, (per_chip,)).astype(
                np.int32)),
        }
    else:
        batch = {
            "clip": jnp.asarray(rng.randint(
                0, 255, (per_chip, frames, CANONICAL_CROP, CANONICAL_CROP,
                         3), np.uint8)),
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
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of variant names")
    args = ap.parse_args()
    gb, frames, crop, splits = map(int, args.bucket.split(","))
    per_chip = gb // 4
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None

    names = (args.variants.split(",") if args.variants
             else list(VARIANTS.keys()))
    results = {}
    for name in names:
        results[name] = time_variant(
            name, VARIANTS[name], per_chip=per_chip, frames=frames,
            crop=crop, splits=splits, steps=args.steps, dtype=dtype)

    if "full" in results:
        full = results["full"]
        print(f"\n# attribution (bucket {args.bucket}, per-chip "
              f"{per_chip}):")
        for name, t in results.items():
            if name in ("full", "no_dw_no_bn", "remat"):
                continue
            print(f"  {name:>14}: {(full - t)*1e3:7.1f} ms")
        if "no_dw_no_bn" in results:
            print(f"  residual(no_dw_no_bn): "
                  f"{results['no_dw_no_bn']*1e3:7.1f} ms")
        if "remat" in results:
            print(f"  remat    : {results['remat']*1e3:7.1f} ms/step "
                  f"(vs full {full*1e3:.1f})")


if __name__ == "__main__":
    main()
