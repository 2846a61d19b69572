"""Free-offset Pallas depthwise 3x3x3 conv (stride 1, SAME), fwd + bwd.

The key idea (third kernel generation, after the C-minor and dense-lane
attempts documented in docs/roofline.md): make every one of the 27 taps a
*free-dimension offset* instead of a lane/sublane roll.  The input is
zero-padded by 1 in (T, H, W) on the XLA side and DMA'd into a VMEM slab
``(T+2, H_blk+2, W+2, M)`` per grid step; a tap ``(dt, dh, dw)`` is then
just the static slice ``slab[dt:dt+T, dh:dh+H_blk, dw:dw+W, :]`` — for
dims that are not the sublane dim this is pure addressing (zero vector
ops), so the whole conv is 27 fused multiply-adds per element with *no*
per-tap masks (edge handling happened once, in the pad).

Two layouts, one kernel body:

- ``layout='nc'``     — natural ``(N, T, H, W, C)``: batch on the grid,
  C on lanes (padded to 128 in VMEM: 42% lane util at C=54, ~84% at
  108..432), W on sublanes so the 9 ``dw != 0`` taps cost one sublane
  shift each.  No relayout of the operand.
- ``layout='packed'`` — ``(N/2, T, H, W, 2C)``: two samples share the
  lane dim (M = 2C = 108 at stage 1 -> 84% util everywhere), and W moves
  off the sublane dim entirely, so ALL 27 taps are free offsets.  Costs
  an XLA transpose on the way in/out when called standalone.

Backward is a single fused kernel producing both dx (conv of the padded
cotangent with the flipped taps) and the 27 per-tap weight-gradient
partials from the same two VMEM slabs, halving bwd HBM traffic vs
separate dx/dk passes.

This replaces the role of the reference's patched-PyTorch depthwise CUDA
kernels (reference README.md:20,31).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Interpreter mode for CPU tests (pallas_call(interpret=True)).
_INTERPRET = False


def set_interpret(v: bool) -> None:
    global _INTERPRET
    _INTERPRET = v


def _pick_h_blk(h: int, row_bytes: int, budget: int) -> int:
    """Largest block <=16 dividing H whose slab (h_blk+2 rows of
    ``row_bytes``) fits the VMEM ``budget``."""
    best = 1
    for cand in (16, 14, 8, 7, 5, 4, 2, 1):
        if h % cand == 0 and (cand + 2) * row_bytes <= budget:
            return cand
    return best


def _taps():
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                yield dt * 9 + dh * 3 + dw, dt, dh, dw


def _fwd_kernel(w_ref, xp_ref, y_ref, *scratch, d1, h_blk, d3, m, flip,
                cast):
    # w_ref is pre-converted to f32 by the wrapper; the slab is converted
    # to f32 ONCE here (a single vector pass) so the 27 tap FMAs carry no
    # per-tap dtype-extension ops.
    if cast:
        slab, slab32, sem = scratch
    else:
        slab, sem = scratch
        slab32 = slab
    b = pl.program_id(0)
    hb = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xp_ref.at[b, :, pl.ds(hb * h_blk, h_blk + 2), :, :], slab, sem)
    cp.start()
    cp.wait()
    if cast:
        slab32[:] = slab[:].astype(jnp.float32)
    acc = None
    for tap, dt, dh, dw in _taps():
        widx = 26 - tap if flip else tap
        xs = slab32[dt:dt + d1, dh:dh + h_blk, dw:dw + d3, :]
        term = xs * w_ref[widx, :]
        acc = term if acc is None else acc + term
    y_ref[0] = acc.astype(y_ref.dtype)


def _bwd_kernel(w_ref, gp_ref, xp_ref, dx_ref, dk_ref, *scratch, d1,
                h_blk, d3, m, cast):
    if cast:
        gslab, xslab, g32, x32, sem = scratch
    else:
        gslab, xslab, sem = scratch
        g32, x32 = gslab, xslab
    b = pl.program_id(0)
    hb = pl.program_id(1)
    cpg = pltpu.make_async_copy(
        gp_ref.at[b, :, pl.ds(hb * h_blk, h_blk + 2), :, :], gslab,
        sem.at[0])
    cpx = pltpu.make_async_copy(
        xp_ref.at[b, :, pl.ds(hb * h_blk, h_blk + 2), :, :], xslab,
        sem.at[1])
    cpg.start()
    cpx.start()
    cpg.wait()
    cpx.wait()
    if cast:
        g32[:] = gslab[:].astype(jnp.float32)
        x32[:] = xslab[:].astype(jnp.float32)

    g_in = g32[1:1 + d1, 1:1 + h_blk, 1:1 + d3, :]
    acc = None
    for tap, dt, dh, dw in _taps():
        # dx = conv(gp, flipped taps): same loop, weight index mirrored
        gs = g32[dt:dt + d1, dh:dh + h_blk, dw:dw + d3, :]
        term = gs * w_ref[26 - tap, :]
        acc = term if acc is None else acc + term
        # dk[tap] partial: <g, x shifted by tap> reduced over this block
        xs = x32[dt:dt + d1, dh:dh + h_blk, dw:dw + d3, :]
        dk_ref[0, 0, tap, :] = jnp.sum(g_in * xs, axis=(0, 1, 2))
    dx_ref[0] = acc.astype(dx_ref.dtype)


def _pad_thw(x5):
    """Zero-pad dims 1..3 of (B, D1, D2, D3, M) by 1 on each side, then
    round the last two dims up to the HBM tile granularity: Mosaic requires
    sliced-DMA buffers to be lane-aligned (minor dim multiple of 128) and
    sublane-aligned (second-minor multiple of 8)."""
    d3, m = x5.shape[-2], x5.shape[-1]
    m_pad = (-m) % 128
    d3_pad = (-(d3 + 2)) % 8
    return jnp.pad(x5, ((0, 0), (1, 1), (1, 1), (1, 1 + d3_pad),
                        (0, m_pad)))


def _pad_lanes(a2):
    """Pad the minor dim of (27, M) weights to a multiple of 128."""
    return jnp.pad(a2, ((0, 0), (0, (-a2.shape[-1]) % 128)))


def _run_fwd(xp, w27, out_dtype, d3, *, flip=False, h_blk=None):
    """xp: (B, D1+2, D2+2, >=D3+2, M) pre-padded (tile-aligned trailing
    dims); w27: (27, M); d3 = true output width."""
    b, d1p, d2p, d3p, m = xp.shape
    d1, d2 = d1p - 2, d2p - 2
    cast = xp.dtype != jnp.float32
    row = d1p * d3p * m * (xp.dtype.itemsize + (4 if cast else 0))
    h_blk = h_blk or _pick_h_blk(d2, row, 7 << 20)
    grid = (b, d2 // h_blk)
    kern = functools.partial(_fwd_kernel, d1=d1, h_blk=h_blk, d3=d3, m=m,
                             flip=flip, cast=cast)
    scratch = [pltpu.VMEM((d1p, h_blk + 2, d3p, m), xp.dtype)]
    if cast:
        scratch.append(pltpu.VMEM((d1p, h_blk + 2, d3p, m), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w27 whole
            pl.BlockSpec(memory_space=pltpu.ANY),    # xp stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, d1, h_blk, d3, m),
            lambda bb, hh: (bb, 0, hh, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d1, d2, d3, m), out_dtype),
        scratch_shapes=scratch,
        interpret=_INTERPRET,
    )(w27.astype(jnp.float32), xp)


def _run_bwd(gp, xp, w27, out_dtype, d3, *, h_blk=None):
    """Fused dx + dk partials.  gp/xp: (B, D1+2, D2+2, >=D3+2, M)."""
    b, d1p, d2p, d3p, m = xp.shape
    d1, d2 = d1p - 2, d2p - 2
    cast = xp.dtype != jnp.float32
    row = 2 * d1p * d3p * m * (xp.dtype.itemsize + (4 if cast else 0))
    h_blk = h_blk or _pick_h_blk(d2, row, 9 << 20)
    nh = d2 // h_blk
    kern = functools.partial(_bwd_kernel, d1=d1, h_blk=h_blk, d3=d3, m=m,
                             cast=cast)
    scratch = [
        pltpu.VMEM((d1p, h_blk + 2, d3p, m), gp.dtype),
        pltpu.VMEM((d1p, h_blk + 2, d3p, m), xp.dtype),
    ]
    if cast:
        scratch.append(pltpu.VMEM((d1p, h_blk + 2, d3p, m), jnp.float32))
        scratch.append(pltpu.VMEM((d1p, h_blk + 2, d3p, m), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    dx, dk_part = pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w27
            pl.BlockSpec(memory_space=pltpu.ANY),    # gp
            pl.BlockSpec(memory_space=pltpu.ANY),    # xp
        ],
        out_specs=(
            pl.BlockSpec((1, d1, h_blk, d3, m),
                         lambda bb, hh: (bb, 0, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 27, m),
                         lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d1, d2, d3, m), out_dtype),
            jax.ShapeDtypeStruct((b, nh, 27, m), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=_INTERPRET,
    )(w27.astype(jnp.float32), gp, xp)
    return dx, jnp.sum(dk_part, axis=(0, 1))  # (27, M)


# ---------------------------------------------------------------------------
# Layout adapters
# ---------------------------------------------------------------------------

def _to_packed(x, n_blk):
    """(N, T, H, W, C) -> (N/n_blk, T, H, W, n_blk*C)."""
    n, t, h, w, c = x.shape
    xr = x.reshape(n // n_blk, n_blk, t, h, w, c)
    xr = jnp.transpose(xr, (0, 2, 3, 4, 1, 5))
    return xr.reshape(n // n_blk, t, h, w, n_blk * c)


def _from_packed(y, n_blk):
    nb, t, h, w, m = y.shape
    c = m // n_blk
    yr = y.reshape(nb, t, h, w, n_blk, c)
    yr = jnp.transpose(yr, (0, 4, 1, 2, 3, 5))
    return yr.reshape(nb * n_blk, t, h, w, c)


def _pick_n_blk(n: int, c: int) -> int:
    """Pack samples into lanes until M = n_blk*C reaches ~128."""
    nb = 1
    while c * nb < 96 and n % (nb * 2) == 0:
        nb *= 2
    return nb


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3d_free(x, w, layout="packed"):
    """Depthwise 3x3x3 conv, stride 1, SAME padding (reference conv3x3x3,
    x3d.py:87-95, the patched-CUDA op of README.md:20,31).

    Args:
      x: ``(N, T, H, W, C)``.
      w: ``(3, 3, 3, 1, C)`` (DHWIO depthwise).
      layout: 'nc' (natural layout, C on lanes) or 'packed'
        (batch-packed lanes; transposes in/out).
    """
    return _dw_free_fwd_impl(x, w, layout)


def _dw_free_fwd_impl(x, w, layout):
    n, t, h, w_, c = x.shape
    w27 = w.reshape(27, c).astype(x.dtype)
    if layout == "packed":
        n_blk = _pick_n_blk(n, c)
        xp = _pad_thw(_to_packed(x, n_blk))
        wt = _pad_lanes(jnp.tile(w27, (1, n_blk)))
        y = _run_fwd(xp, wt, x.dtype, w_)[..., :n_blk * c]
        return _from_packed(y, n_blk)
    xp = _pad_thw(x)
    return _run_fwd(xp, _pad_lanes(w27), x.dtype, w_)[..., :c]


def _dw_free_vjp_fwd(x, w, layout):
    return _dw_free_fwd_impl(x, w, layout), (x, w)


def _dw_free_vjp_bwd(layout, res, g):
    x, w = res
    n, t, h, w_, c = x.shape
    w27 = w.reshape(27, c).astype(x.dtype)
    if layout == "packed":
        n_blk = _pick_n_blk(n, c)
        gp = _pad_thw(_to_packed(g, n_blk))
        xp = _pad_thw(_to_packed(x, n_blk))
        wt = _pad_lanes(jnp.tile(w27, (1, n_blk)))
        dx, dk_m = _run_bwd(gp, xp, wt, g.dtype, w_)
        dx = _from_packed(dx[..., :n_blk * c], n_blk)
        dk = jnp.sum(dk_m[:, :n_blk * c].reshape(27, n_blk, c), axis=1)
    else:
        gp = _pad_thw(g)
        xp = _pad_thw(x)
        dx, dk = _run_bwd(gp, xp, _pad_lanes(w27), g.dtype, w_)
        dx = dx[..., :c]
        dk = dk[:, :c]
    return dx, dk.reshape(w.shape).astype(w.dtype)


dw_conv3d_free.defvjp(_dw_free_vjp_fwd, _dw_free_vjp_bwd)
