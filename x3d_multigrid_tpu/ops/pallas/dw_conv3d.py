"""Pallas TPU kernel: depthwise 3x3x3 conv, channels-last.

STATUS: EXPERIMENTAL, NOT WIRED — measured slower than XLA at every X3D
shape (lane-starved at C<128; see ops/pallas/README.md and
docs/roofline.md).  The model always takes the XLA path in ops/conv3d.py.

The X3D hot spot (reference needs a patched PyTorch CUDA build for this op,
README.md:20,31).  On TPU the op is VPU/HBM-bound: 27 fused multiply-adds
per element with C on the 128-lane axis.  The kernel computes one (n, t,
H-tile) output block per grid step from a (3, TILE_H*s+2, W+2, C) input
window of the pre-padded input, accumulating the 27 taps in fp32 registers
and writing back in the input dtype.

Backward passes reuse XLA's native conv transposes via ``jax.custom_vjp``
— the same memory-bound shape family, which XLA emits well; the forward is
where Pallas control of the tap schedule pays.

Usage: ``dw_conv3d_pallas(x, w, spatial_stride=1|2)`` — drop-in for
ops/conv3d.depthwise_conv3d (weights ``(3, 3, 3, 1, C)``).
"""

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(h_out: int) -> int:
    """Largest divisor of h_out no bigger than 16 (keeps the input window
    in VMEM: (3, 2*16+2, W+2, C) bf16 for C<=432, W<=224 is ~3 MB)."""
    for cand in (16, 14, 12, 11, 8, 7, 6, 5, 4, 3, 2, 1):
        if h_out % cand == 0:
            return cand
    return 1


def _dw_kernel(x_ref, w_ref, o_ref, *, tile_h: int, w_out: int):
    """One (n, t, h-tile) output block (stride 1).

    x_ref: (1, 3, tile_h + 2, W_pad, C) input window (pre-padded)
    w_ref: (3, 3, 3, C)
    o_ref: (1, 1, tile_h, w_out, C)
    """
    acc = jnp.zeros(o_ref.shape[2:], jnp.float32)  # (tile_h, w_out, C)
    x = x_ref[0]
    for dt in range(3):
        plane = x[dt]  # (tile_h*stride+2, W_pad, C)
        for dh in range(3):
            for dw in range(3):
                win = plane[dh:dh + tile_h, dw:dw + w_out, :]
                acc += win.astype(jnp.float32) * \
                    w_ref[dt, dh, dw, :].astype(jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@jax.jit
def _dw_conv3d_pallas_fwd(x, w):
    n, t, h, wd, c = x.shape
    h_out, w_out = h, wd
    tile_h = _pick_tile_h(h_out)

    # Pre-pad (XLA fuses this into a cheap copy).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w_pad = xp.shape[3]
    wk = w.reshape(3, 3, 3, c)

    grid = (n, t, h_out // tile_h)
    # Overlapping input windows: t and h use elementwise start indices
    # (pl.Element) since Blocked dims scale the index by the block size.
    in_specs = [
        pl.BlockSpec(
            (pl.Element(1), pl.Element(3), pl.Element(tile_h + 2),
             pl.Element(w_pad), pl.Element(c)),
            lambda ni, ti, hi: (ni, ti, hi * tile_h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (3, 3, 3, c), lambda ni, ti, hi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, tile_h, w_out, c),
        lambda ni, ti, hi: (ni, ti, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(_dw_kernel, tile_h=tile_h, w_out=w_out)
    flops = 2 * 27 * n * t * h_out * w_out * c
    bytes_accessed = (xp.size + n * t * h_out * w_out * c) * x.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, h_out, w_out, c), x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        # CPU (tests / virtual meshes) has no Mosaic: interpret there
        interpret=(jax.default_backend() == "cpu"),
    )(xp, wk)


def _impl(x, w, spatial_stride):
    if spatial_stride != 1:
        from x3d_multigrid_tpu.ops.conv3d import depthwise_conv3d
        return depthwise_conv3d(x, w, spatial_stride=spatial_stride)
    return _dw_conv3d_pallas_fwd(x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3d_pallas(x, w, spatial_stride: int = 1):
    """Depthwise 3x3x3 conv, stride (1, s, s), padding 1 — Pallas forward
    for stride 1 (22 of X3D-M's 26 blocks), XLA for stride 2 (Mosaic has
    no strided vector slices); XLA backward.  ``x``: (N, T, H, W, C);
    ``w``: (3, 3, 3, 1, C)."""
    return _impl(x, w, spatial_stride)


def _fwd(x, w, spatial_stride):
    return _impl(x, w, spatial_stride), (x, w)


def _bwd(spatial_stride, res, g):
    # XLA's native conv transposes (well-tiled on TPU) for both grads.
    from x3d_multigrid_tpu.ops.conv3d import depthwise_conv3d
    x, w = res
    _, vjp = jax.vjp(
        lambda xx, ww: depthwise_conv3d(xx, ww,
                                        spatial_stride=spatial_stride),
        x, w)
    return vjp(g)


dw_conv3d_pallas.defvjp(_fwd, _bwd)
