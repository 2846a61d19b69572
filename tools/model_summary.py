"""Model summary: per-stage parameters, output shapes and forward FLOPs.

The reference gestures at this with a commented-out ``torchsummary.summary``
call (/root/reference/train_x3d_kinetics_multigrid.py:176) but never ships
it; this tool provides the real thing for every zoo version and both task
heads.  Parameter shapes come from ``jax.eval_shape`` over the actual
``init_params`` (no memory is allocated, no compile happens — safe on any
host), so the table can never drift from the model code.  FLOPs are the
analytic conv/matmul counts at 2 FLOPs per multiply-add; they
cross-check against the compiled step's own cost model
(tools/cost_analysis.py: 0.51 TFLOP fwd+bwd at per-chip batch 32, T=8 ==
~5.3 GFLOP/clip fwd, vs 4.7 analytic here + BN/SE/swish elementwise
passes that this table deliberately omits).

Usage:
    python -m tools.model_summary --version M
    python -m tools.model_summary --version XL --task loc --frames 16
"""

import argparse
import functools

import jax
import numpy as np

from x3d_multigrid_tpu.models import x3d


def _count(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def summarize(cfg, batch: int = 1, frames: int = 16, crop: int = 224):
    """Returns (rows, totals): one row per module group.

    Row: (name, params, out_shape, gflops) with ``out_shape`` the
    activation shape after the group in (N, T, H, W, C) layout.
    """
    shapes = jax.eval_shape(
        functools.partial(x3d.init_params, cfg=cfg),
        jax.random.PRNGKey(0))
    planes = cfg.block_inplanes
    n_blocks = cfg.stage_blocks

    rows = []
    N, T, H = batch, frames, crop
    vox = lambda h: N * T * h * h  # voxels at spatial size h

    # Stem: spatial 1x3x3 stride-2 conv (C_in -> C1) + temporal 5x1x1
    # depthwise + SubBN (reference x3d.py:196-208).
    h = H // 2
    c1 = planes[0][1]
    stem_flops = (vox(h) * 9 * cfg.n_input_channels * c1    # conv1_s MACs
                  + vox(h) * 5 * c1) * 2                    # conv1_t MACs
    stem_params = _count([shapes["conv1_s"], shapes["conv1_t"],
                          shapes["bn1"]])
    rows.append(("stem (conv1_s + conv1_t + bn1)", stem_params,
                 (N, T, h, h, c1), stem_flops / 1e9))

    # Stages: each block = pw expand + dw 3x3x3 + (SE on even blocks) +
    # pw project (+ pw downsample on block 0); spatial stride 2 at block 0.
    c_in = c1
    for s in range(4):
        exp_c, out_c = planes[s]
        h //= 2
        flops = 0
        for i in range(n_blocks[s]):
            # The stride lives in the dw conv (reference x3d.py:87-95), so
            # block 0's expand conv runs at the PRE-stride resolution.
            flops += vox(h * 2 if i == 0 else h) * c_in * exp_c  # pw1 MACs
            flops += vox(h) * 27 * exp_c            # dw 3x3x3 MACs
            if i % 2 == 0:                          # SE (global pool + 2
                se_c = x3d._se_width(exp_c)         #  tiny matmuls/sample)
                flops += N * (exp_c * se_c * 2)
            flops += vox(h) * exp_c * out_c         # pw3 project MACs
            if i == 0:
                flops += vox(h) * c_in * out_c      # downsample MACs
            c_in = out_c
        name = f"layer{s + 1}"
        rows.append((f"{name} ({n_blocks[s]} blocks, {exp_c}/{out_c}ch)",
                     _count(shapes[name]), (N, T, h, h, out_c),
                     flops * 2 / 1e9))

    # conv5 expand + head (reference x3d.py:231-244).
    c5 = planes[3][0]
    conv5_flops = vox(h) * c_in * c5 * 2
    rows.append(("conv5 + bn5", _count([shapes["conv5"], shapes["bn5"]]),
                 (N, T, h, h, c5), conv5_flops / 1e9))

    t_head = T if cfg.task == "loc" else 1
    head_flops = (N * t_head * c5 * cfg.fc1_dim
                  + N * t_head * cfg.fc1_dim * cfg.n_classes) * 2
    head_shape = ((N, T, cfg.n_classes) if cfg.task == "loc"
                  else (N, cfg.n_classes))
    rows.append((f"head (pool + fc1 + fc2, task={cfg.task})",
                 _count([shapes["fc1"], shapes["fc2"]]),
                 head_shape, head_flops / 1e9))

    total_params = _count(shapes)
    total_gflops = sum(r[3] for r in rows)
    return rows, (total_params, total_gflops)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--version", default="M", choices=["S", "M", "XL"])
    ap.add_argument("--task", default="class", choices=["class", "loc"])
    ap.add_argument("--n-classes", type=int, default=400)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--crop", type=int, default=None,
                    help="input crop (default: the version's CROP_SIZE)")
    args = ap.parse_args()

    cfg = x3d.x3d_config(args.version, n_classes=args.n_classes,
                         task=args.task)
    crop = args.crop or x3d.CROP_SIZE[args.version]
    rows, (params, gflops) = summarize(cfg, args.batch, args.frames, crop)

    print(f"X3D-{args.version} task={args.task} input="
          f"({args.batch}, {args.frames}, {crop}, {crop}, "
          f"{cfg.n_input_channels})")
    w = max(len(r[0]) for r in rows)
    print(f"{'module':<{w}}  {'params':>10}  {'output shape':>22}  "
          f"{'GFLOPs':>8}")
    for name, p, shape, gf in rows:
        print(f"{name:<{w}}  {p:>10,}  {str(shape):>22}  {gf:>8.2f}")
    print(f"{'TOTAL':<{w}}  {params:>10,}  {'':>22}  {gflops:>8.2f}")


if __name__ == "__main__":
    main()
