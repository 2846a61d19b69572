"""Measured bytes/step via XLA's own cost model (VERDICT #2's
"record measured bytes/step"): AOT-compile the sharded train step per
bucket and read ``compiled.cost_analysis()`` — bytes accessed and flops
of the post-fusion HLO actually executed.

Result (v5e, bf16, 2026-08-17):
  bucket (128,8,224,4):  90.37 GB accessed, 0.51 TFLOP
      -> 110.3 ms at the 819 GB/s HBM roofline; measured 116 ms (~95%
         bandwidth-saturated).
  bucket (2048,2,111,32): 60.65 GB accessed, 0.58 TFLOP
      -> 74.1 ms implied; measured 64.6 ms (cost model overcounts fused
         traffic somewhat — the program runs AT the roofline).

Interpretation: scheduling is not the bottleneck; byte TRAFFIC is.  The
2-2.3x gap to the ~35-45 GB theoretical minimum (docs/roofline.md) is
materialized intermediates at fusion boundaries.

Run: python tools/cost_analysis.py  (single TPU client at a time).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from x3d_multigrid_tpu.models import x3d_config, init_params, init_bn_state
from x3d_multigrid_tpu.parallel import data_mesh, make_train_step
from x3d_multigrid_tpu.train import init_momentum
from x3d_multigrid_tpu.train.recipes.kinetics_multigrid import (
    KINETICS_MEAN, KINETICS_STD,
)

BUCKETS = [(128, 8, 224, 4), (2048, 2, 111, 32), (256, 4, 224, 8)]


def main():
    mesh = data_mesh(1)
    cfg = x3d_config("M", n_classes=400)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mom = init_momentum(params)
    rng = np.random.RandomState(0)
    for gb, frames, crop, splits in BUCKETS:
        per_chip = gb // 4
        bn = init_bn_state(cfg, splits)
        batch = {
            "clip": jnp.asarray(rng.randint(
                0, 255, (per_chip, frames, 224, 224, 3), np.uint8)),
            "flip": jnp.asarray(rng.rand(per_chip) < 0.5),
            "label": jnp.asarray(
                rng.randint(0, 400, (per_chip,)).astype(np.int32)),
        }
        step = make_train_step(
            cfg, mesh, loss="kinetics", compute_dtype=jnp.bfloat16,
            preprocess_mean_std=(KINETICS_MEAN, KINETICS_STD),
            donate=False)
        comp = step.lower(params, mom, bn, batch, jnp.float32(0.1),
                          jax.random.PRNGKey(1), out_size=crop).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ba, fl = ca.get("bytes accessed", 0.0), ca.get("flops", 0.0)
        print(f"bucket ({gb},{frames},{crop},{splits}) per-chip "
              f"{per_chip}: bytes accessed {ba/1e9:.2f} GB, "
              f"flops {fl/1e12:.2f} TFLOP -> HBM time "
              f"{ba/819e9*1e3:.1f} ms @819GB/s, MXU time "
              f"{fl/197e12*1e3:.1f} ms @197TF", flush=True)


if __name__ == "__main__":
    main()
