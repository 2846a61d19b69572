"""Pointwise conv with a SubBN-stats epilogue: one Pallas pass emits
``y = x @ w`` AND the per-split ``(sum, sumsq)`` of ``y``.

Motivation (docs/roofline.md): the train step is HBM-bound, and every
SubBN stats pass re-reads its conv's output from HBM (~1 bucket-dependent
pass per BN).  Producing the stats in the conv's epilogue — per-row-tile
partial sums accumulated in VMEM while the output tile is still resident —
removes that read for the two pointwise convs of every block (conv1
expand, conv3 project; the reference's conv1x1x1, x3d.py:98-103, feeding
SubBatchNorm3d, x3d.py:47-52).  Upper bound of the win on (128,8,224,4):
~2-3 ms of a ~116 ms step (the stats READ is one bf16 pass over the
expanded activations; the rest of the 21 ms SubBN ablation cost is
normalize/backward work this fusion cannot remove).

Semantics: rows of the flattened ``(N, T*H*W, Cin)`` input belong to
split ``n % S`` (the reference's strided grouping, x3d.py:48-52); sums
are computed from the MATERIALIZED ``y`` (cast to the output dtype first)
so downstream normalization is numerically identical to re-reading the
stored activation.

The op is fully differentiable: cotangents of (y, sum, sumsq) combine
into an effective dy (``gsum`` broadcasts over each split's rows;
``gsumsq`` adds ``2*y*gsumsq``), then dx/dw are plain XLA matmuls — the
backward costs what the unfused backward costs.

Falls back to the XLA composition (einsum + reshaped reductions) off-TPU
or for shapes without a clean row tiling, so callers never need to
special-case.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TILE_CAP = 2048

# Test hook: run the Pallas kernel in interpreter mode on CPU (exercises
# the real kernel logic — grid accumulation, dynamic split indexing —
# without TPU hardware).  Production CPU runs take the XLA fallback.
INTERPRET = False


def _pick_tile(thw: int):
    """Largest divisor of ``thw`` that is a multiple of 8 and <= cap."""
    best = None
    for t in range(8, min(thw, _TILE_CAP) + 1, 8):
        if thw % t == 0:
            best = t
    return best


def _xla_reference(x, w, splits: int, out_dtype):
    """Unfused composition with identical semantics (also the fallback)."""
    n, t, h, wd, cin = x.shape
    cout = w.shape[-1]
    y = jnp.einsum("nthwc,cd->nthwd", x, w.reshape(cin, cout),
                   preferred_element_type=jnp.float32).astype(out_dtype)
    yf = y.reshape(n // splits, splits, t * h * wd, cout).astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 2)), jnp.sum(jnp.square(yf), axis=(0, 2))


def _kernel(x_ref, w_ref, y_ref, sum_ref, sq_ref, acc_sum, acc_sq,
            *, splits: int, out_dtype):
    import jax.experimental.pallas as pl

    n = pl.program_id(0)
    i = pl.program_id(1)
    last = jnp.logical_and(n == pl.num_programs(0) - 1,
                           i == pl.num_programs(1) - 1)

    @pl.when(jnp.logical_and(n == 0, i == 0))
    def _init():
        acc_sum[...] = jnp.zeros_like(acc_sum)
        acc_sq[...] = jnp.zeros_like(acc_sq)

    y = jnp.dot(x_ref[0], w_ref[...],
                preferred_element_type=jnp.float32)      # (TILE, Cout) f32
    y_out = y.astype(out_dtype)
    y_ref[0] = y_out
    yf = y_out.astype(jnp.float32)  # stats of the MATERIALIZED y
    s = jax.lax.rem(n, splits)
    ps = jnp.sum(yf, axis=0, keepdims=True)              # (1, Cout)
    pq = jnp.sum(yf * yf, axis=0, keepdims=True)
    acc_sum[pl.ds(s, 1), :] += ps
    acc_sq[pl.ds(s, 1), :] += pq

    @pl.when(last)
    def _flush():
        sum_ref[...] = acc_sum[...]
        sq_ref[...] = acc_sq[...]


def _forward(x, w, splits: int, out_dtype):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, t, h, wd, cin = x.shape
    cout = w.shape[-1]
    thw = t * h * wd
    tile = _pick_tile(thw)
    backend = jax.default_backend()
    if tile is None or n % splits or (
            backend not in ("tpu", "axon") and not INTERPRET):
        return _xla_reference(x, w, splits, out_dtype)

    x3 = x.reshape(n, thw, cin)
    w2 = w.reshape(cin, cout)
    grid = (n, thw // tile)
    y3, sums, sqs = pl.pallas_call(
        functools.partial(_kernel, splits=splits, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, cin), lambda ni, ti: (ni, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, cout), lambda ni, ti: (ni, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((splits, cout), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((splits, cout), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, thw, cout), out_dtype),
            jax.ShapeDtypeStruct((splits, cout), jnp.float32),
            jax.ShapeDtypeStruct((splits, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((splits, cout), jnp.float32),
            pltpu.VMEM((splits, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=INTERPRET,
    )(x3, w2)
    return y3.reshape(n, t, h, wd, cout), sums, sqs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pw_conv_subbn_stats(x, w, splits: int, out_dtype):
    """``(y, sum, sumsq)`` of the pointwise conv, per-split sums fused.

    Args:
      x: ``(N, T, H, W, Cin)`` activations (channels last).
      w: ``(1, 1, 1, Cin, Cout)`` or ``(Cin, Cout)`` pointwise weights.
      splits: SubBN split count ``S`` (``N % S == 0``).
      out_dtype: dtype ``y`` is materialized in (stats are computed from
        the materialized value, in float32).
    Returns:
      ``y (N, T, H, W, Cout)``, ``sum (S, Cout) f32``, ``sumsq (S, Cout)
      f32`` where row ``s`` reduces over samples ``n % S == s``.
    """
    return _forward(x, w, splits, out_dtype)


def _fwd(x, w, splits, out_dtype):
    y, s, q = _forward(x, w, splits, out_dtype)
    return (y, s, q), (x, w, y)


def _bwd(splits, out_dtype, res, cots):
    x, w, y = res
    gy, gsum, gsq = cots
    n = x.shape[0]
    cin, cout = w.reshape(-1, w.shape[-1]).shape
    # broadcast per-split cotangents back over each split's rows
    split_of = (jnp.arange(n) % splits)
    gy_eff = gy.astype(jnp.float32)
    if gsum is not None:
        gy_eff = gy_eff + gsum[split_of][:, None, None, None, :]
    if gsq is not None:
        gy_eff = gy_eff + 2.0 * y.astype(jnp.float32) \
            * gsq[split_of][:, None, None, None, :]
    gy_eff = gy_eff.astype(y.dtype)
    w2 = w.reshape(cin, cout)
    dx = jnp.einsum("nthwd,cd->nthwc", gy_eff, w2,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.einsum("nthwc,nthwd->cd", x, gy_eff,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw.reshape(w.shape)


pw_conv_subbn_stats.defvjp(_fwd, _bwd)


def stats_from_sums(sums, sqs, count_per_split: int):
    """(sum, sumsq) -> (mean, biased var), the quantities sub_batch_norm
    consumes (matching its in-house mean2 - mean^2 formulation)."""
    mean = sums / count_per_split
    var = jnp.maximum(sqs / count_per_split - jnp.square(mean), 0.0)
    return mean, var
