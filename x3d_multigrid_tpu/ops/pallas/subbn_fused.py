"""Fused Pallas SubBN training forward: split statistics + normalization in
one kernel.

XLA emits the train-mode SubBN (ops/subbn.py) at ~170 GB/s effective on
v5e — 5x off the HBM roofline — and BN accounts for ~1/4 of the X3D train
step.  This kernel streams the activation twice within a single
``pallas_call`` (grid phase 0: accumulate per-(split, channel) sums and
sum-of-squares in fp32 VMEM scratch; phase 1: normalize + affine), never
materializing fp32 copies.

Grouping matches the reference's strided split assignment (sample n ->
split n % S; ops/subbn.py): the caller's ``(N, T, H, W, C)`` input is
viewed as ``(N//S, S, THW, C)`` — a free reshape — and blocks are indexed
by (i, s).

Backward is a hand-written XLA formula via ``jax.custom_vjp`` (the
standard BN gradient per split), so autodiff works end-to-end.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from x3d_multigrid_tpu.ops.subbn import EPS


def _kernel(x_ref, scale_ref, bias_ref, y_ref, mean_ref, var_ref,
            acc_ref, *, n_per: int, eps: float):
    """Grid (2, N//S, S, TH_chunks).  Blocks: x/y (1, 1, tile, W, C);
    stats (S, C) whole-array; scratch acc (2, S, C) fp32 (sum / sumsq)."""
    phase = pl.program_id(0)
    i = pl.program_id(1)
    s = pl.program_id(2)
    k = pl.program_id(3)
    x = x_ref[0, 0]  # (tile, W, C)

    @pl.when(jnp.logical_and(
        phase == 0,
        jnp.logical_and(i == 0, jnp.logical_and(s == 0, k == 0))))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _accumulate():
        xf = x.astype(jnp.float32)
        acc_ref[0, s, :] += jnp.sum(xf, axis=(0, 1))
        acc_ref[1, s, :] += jnp.sum(xf * xf, axis=(0, 1))

    @pl.when(phase == 1)
    def _normalize():
        mean = acc_ref[0, s, :] / n_per
        var = jnp.maximum(acc_ref[1, s, :] / n_per - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        a = (scale_ref[...].astype(jnp.float32) * inv)[None, None, :]
        b = (bias_ref[...].astype(jnp.float32) - mean * scale_ref[...]
             .astype(jnp.float32) * inv)[None, None, :]
        y_ref[0, 0] = (x.astype(jnp.float32) * a + b).astype(y_ref.dtype)

        @pl.when(jnp.logical_and(i == 0, k == 0))
        def _emit_stats():
            mean_ref[s, :] = mean
            var_ref[s, :] = var


def _pick_tile(th: int, w: int, c: int, itemsize: int,
               budget: int = 1 << 21) -> int:
    """Largest divisor of T*H whose VMEM block (tile, W, C-padded-to-128)
    stays under ~2 MB (leaves room for double buffering of in+out)."""
    row_bytes = max(w, 8) * max(c, 128) * itemsize
    best = 1
    for tile in range(1, th + 1):
        if th % tile == 0 and tile * row_bytes <= budget:
            best = tile
    return best


@functools.partial(jax.jit, static_argnames=("num_splits", "eps"))
def _fused_fwd(x, scale, bias, *, num_splits: int, eps: float = EPS):
    n, t, h, w, c = x.shape
    s = num_splits
    th = t * h
    xg = x.reshape(n // s, s, th, w, c)
    n_per = (n // s) * th * w
    tile = _pick_tile(th, w, c, x.dtype.itemsize)

    grid = (2, n // s, s, th // tile)
    out_shape = (
        jax.ShapeDtypeStruct(xg.shape, x.dtype),         # y
        jax.ShapeDtypeStruct((s, c), jnp.float32),       # mean
        jax.ShapeDtypeStruct((s, c), jnp.float32),       # var (biased)
    )
    in_specs = [
        pl.BlockSpec((1, 1, tile, w, c),
                     lambda p, i, sp, k: (i, sp, k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda p, i, sp, k: (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda p, i, sp, k: (0,),
                     memory_space=pltpu.VMEM),
    ]

    # During phase 0 nothing is written: park every visit on block 0 so the
    # pipeline doesn't stream untouched y blocks back to HBM.
    def y_index(p, i, sp, k):
        return (jnp.where(p == 1, i, 0), jnp.where(p == 1, sp, 0),
                jnp.where(p == 1, k, 0), 0, 0)

    out_specs = (
        pl.BlockSpec((1, 1, tile, w, c), y_index,
                     memory_space=pltpu.VMEM),
        # stats as whole-array blocks (Mosaic needs sublane-aligned or
        # full-dim blocks); rows written with a dynamic split index
        pl.BlockSpec((s, c), lambda p, i, sp, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, c), lambda p, i, sp, k: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    y, mean, var = pl.pallas_call(
        functools.partial(_kernel, n_per=n_per, eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, s, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * th * w * c, transcendentals=0,
            bytes_accessed=3 * n * th * w * c * x.dtype.itemsize),
        interpret=(jax.default_backend() == "cpu"),
    )(xg, scale, bias)
    return y.reshape(x.shape), mean, var


# ---------------------------------------------------------------------------
# Packed-lane variant: C < 128 wastes (128-C)/128 of every vector op in the
# channels-minor layout, so this kernel flattens (W, C) onto the lane axis
# (WC ~ 2.6-6k elements, <3% padding).  Per-channel folds (stats) and
# broadcasts (scale/inv) become two tiny MXU matmuls against a one-hot
# (WC, C) matrix, done once per split and cached in VMEM scratch.
# ---------------------------------------------------------------------------

def _packed_kernel(x_ref, fold_ref, scale_ref, bias_ref, y_ref, mean_ref,
                   var_ref, acc_ref, ab_ref, *, n_per: int, eps: float):
    """Grid (2, N//S, S, TH_chunks).  Blocks: x/y (1, 1, tile, WC);
    fold (WC, C) one-hot; stats (S, C); scratch acc/ab (2, S, WC) fp32."""
    phase = pl.program_id(0)
    i = pl.program_id(1)
    s = pl.program_id(2)
    k = pl.program_id(3)
    x = x_ref[0, 0]  # (tile, WC)

    @pl.when(jnp.logical_and(
        phase == 0,
        jnp.logical_and(i == 0, jnp.logical_and(s == 0, k == 0))))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _accumulate():
        xf = x.astype(jnp.float32)
        acc_ref[0, s, :] += jnp.sum(xf, axis=0)
        acc_ref[1, s, :] += jnp.sum(xf * xf, axis=0)

    @pl.when(jnp.logical_and(phase == 1,
                             jnp.logical_and(i == 0, k == 0)))
    def _fold_stats():
        fold = fold_ref[...]  # (WC, C) one-hot fp32
        sums = acc_ref[0, s, :][None, :]     # (1, WC)
        sumsqs = acc_ref[1, s, :][None, :]
        mean = jnp.dot(sums, fold, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32) / n_per  # (1, C)
        m2 = jnp.dot(sumsqs, fold, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32) / n_per
        var = jnp.maximum(m2 - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        a_c = scale_ref[...].astype(jnp.float32)[None, :] * inv   # (1, C)
        b_c = bias_ref[...].astype(jnp.float32)[None, :] - mean * a_c
        # broadcast (1, C) back onto lanes: contract with fold over C
        ab_ref[0, s, :] = jax.lax.dot_general(
            a_c, fold, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)[0]
        ab_ref[1, s, :] = jax.lax.dot_general(
            b_c, fold, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)[0]
        mean_ref[s, :] = mean[0]
        var_ref[s, :] = var[0]

    @pl.when(phase == 1)
    def _normalize():
        a = ab_ref[0, s, :][None, :]
        b = ab_ref[1, s, :][None, :]
        y_ref[0, 0] = (x.astype(jnp.float32) * a + b).astype(y_ref.dtype)


def _pick_tile_packed(th: int, wc: int, itemsize: int,
                      budget: int = 1 << 21) -> int:
    row = ((wc + 127) // 128) * 128 * itemsize
    best = th  # whole axis always legal (block dim == array dim)
    for tile in range(8, th, 8):
        if th % tile == 0 and tile * row <= budget:
            best = tile
    if best * row > budget and th * row <= (1 << 23):
        best = th
    return best


@functools.partial(jax.jit, static_argnames=("num_splits", "eps"))
def _fused_fwd_packed(x, scale, bias, *, num_splits: int,
                      eps: float = EPS):
    n, t, h, w, c = x.shape
    s = num_splits
    th, wc = t * h, w * c
    xg = x.reshape(n // s, s, th, wc)
    n_per = (n // s) * th * w
    tile = _pick_tile_packed(th, wc, x.dtype.itemsize)

    # one-hot fold matrix: lane index w*C + c -> channel c
    fold = jnp.equal(
        jnp.arange(wc)[:, None] % c, jnp.arange(c)[None, :]
    ).astype(jnp.float32)

    grid = (2, n // s, s, th // tile)
    out_shape = (
        jax.ShapeDtypeStruct(xg.shape, x.dtype),
        jax.ShapeDtypeStruct((s, c), jnp.float32),
        jax.ShapeDtypeStruct((s, c), jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((1, 1, tile, wc), lambda p, i, sp, k: (i, sp, k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wc, c), lambda p, i, sp, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda p, i, sp, k: (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda p, i, sp, k: (0,),
                     memory_space=pltpu.VMEM),
    ]

    def y_index(p, i, sp, k):
        return (jnp.where(p == 1, i, 0), jnp.where(p == 1, sp, 0),
                jnp.where(p == 1, k, 0), 0)

    out_specs = (
        pl.BlockSpec((1, 1, tile, wc), y_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((s, c), lambda p, i, sp, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, c), lambda p, i, sp, k: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    y, mean, var = pl.pallas_call(
        functools.partial(_packed_kernel, n_per=n_per, eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, s, wc), jnp.float32),
                        pltpu.VMEM((2, s, wc), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * th * wc, transcendentals=0,
            bytes_accessed=3 * n * th * wc * x.dtype.itemsize),
        interpret=(jax.default_backend() == "cpu"),
    )(xg, fold, scale, bias)
    return y.reshape(x.shape), mean, var


# Lane-packing pays when C leaves most of the 128 lanes idle.
_PACKED_THRESHOLD_C = 128


def _dispatch_fwd(x, scale, bias, num_splits):
    if x.shape[-1] < _PACKED_THRESHOLD_C:
        return _fused_fwd_packed(x, scale, bias, num_splits=num_splits)
    return _fused_fwd(x, scale, bias, num_splits=num_splits)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def subbn_train_fused(x, scale, bias, num_splits: int):
    """Fused SubBN training forward.

    Returns ``(y, mean, var)`` with mean/var of shape ``(S, C)`` (biased
    var, matching ops/subbn.py's normalization statistics).
    """
    return _dispatch_fwd(x, scale, bias, num_splits)


def _vjp_fwd(x, scale, bias, num_splits):
    y, mean, var = _dispatch_fwd(x, scale, bias, num_splits)
    return (y, mean, var), (x, scale, mean, var)


def _vjp_bwd(num_splits, res, cts):
    """Standard per-split BN gradient (expressed in XLA; it fuses into the
    surrounding backward ops).  Gradients w.r.t. the emitted mean/var
    outputs are ignored — they only feed the (stop-gradient) running-stat
    EMA, as in torch BN."""
    x, scale, mean, var = res
    gy = cts[0]
    n, t, h, w, c = x.shape
    s = num_splits
    xg = x.reshape(n // s, s, t, h, w, c).astype(jnp.float32)
    gg = gy.reshape(n // s, s, t, h, w, c).astype(jnp.float32)
    n_per = (n // s) * t * h * w

    inv = jax.lax.rsqrt(var + eps_const())            # (S, C)
    xhat = (xg - mean[None, :, None, None, None, :]) * \
        inv[None, :, None, None, None, :]
    g_sum = jnp.sum(gg, axis=(0, 2, 3, 4))            # (S, C)
    gx_sum = jnp.sum(gg * xhat, axis=(0, 2, 3, 4))    # (S, C)

    dscale = jnp.sum(gx_sum, axis=0)
    dbias = jnp.sum(g_sum, axis=0)

    a = (scale.astype(jnp.float32) * inv)[None, :, None, None, None, :]
    dx = a * (gg - g_sum[None, :, None, None, None, :] / n_per
              - xhat * gx_sum[None, :, None, None, None, :] / n_per)
    return (dx.reshape(x.shape).astype(x.dtype),
            dscale.astype(scale.dtype), dbias.astype(scale.dtype))


def eps_const():
    return EPS


subbn_train_fused.defvjp(_vjp_fwd, _vjp_bwd)
