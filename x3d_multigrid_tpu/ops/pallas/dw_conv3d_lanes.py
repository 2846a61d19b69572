"""Dense-lane Pallas depthwise 3x3x3 conv (fwd + bwd custom_vjp).

STATUS: EXPERIMENTAL, NOT WIRED.  Numerically exact (fwd/dx/dk tested vs
the XLA oracle) but measured 2-4x SLOWER than XLA on v5e: the op is
VPU-bound — 27 multiply-adds per element is irreducible, and this
kernel's 24 rolls + edge masks put it at ~2.9x that floor while XLA's
schedule sits at ~1.7x.  Kept as a tested baseline for a future fused
bn->dw->SE->swish block kernel (where the roll cost amortizes over more
fused work).  See ops/pallas/README.md and docs/roofline.md.

Why it seemed promising: XLA's depthwise conv measures only ~86-175 GB/s
at X3D's thin channels — but that is the VPU floor showing, not wasted
bandwidth.  (The reference repo needed a patched PyTorch build for this
same op on GPU, README.md:20,31.)

Layout: view ``x (N,T,H,W,C)`` as ``(N*T, H, W*C)`` planes.  Every load is
lane-dense (W*C = 3024 at X3D-M stride-1 block shapes).  Then a 3x3x3
depthwise conv is 27 fused multiply-adds over rolled planes:

- temporal taps: three input refs indexed at ``nt-1, nt, nt+1`` (clamped at
  the array edge; zeroed in-kernel when ``t`` is at a clip boundary),
- H taps: sublane rolls by +-1 with top/bottom row masks,
- W taps: lane rolls by +-C; the wrapped lanes are zeroed for free by
  pre-masking the broadcast kernel table ``kt (27, W*C)`` (tap coefficient
  is 0 exactly where the roll wrapped).

Weight grad accumulates ``sum_h rolled(x) * g`` into a ``(27, W*C)`` output
revisited across the sequential grid (standard TPU accumulation — inputs
still stream, unlike round 1's two-phase revisiting kernels); wrapped-lane
and edge-row contributions are masked, and the W copies fold to ``(3,3,3,C)``
in the wrapper.

Supports stride 1, padding 1 (the 22 of 26 X3D blocks where the time goes);
stride-2 blocks fall back to XLA in ops/conv3d.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# The stage-1 (56, 3024) block's working set lands ~1% over Mosaic's 16 MB
# default scoped-VMEM budget; raise it (v5e has headroom).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _build_tap_table(w, width, c):
    """(27, W*C) f32: tap (a,b,cw) row = k[a,b,cw,:] tiled over W, with the
    lanes that a +-C roll would wrap zeroed."""
    k = w.reshape(3, 3, 3, c).astype(jnp.float32)      # (kd, kh, kw, C)
    kt = jnp.tile(k.reshape(27, 1, c), (1, width, 1)).reshape(27, width * c)
    lane_w = np.arange(width * c) // c                  # w index per lane
    m_first = jnp.asarray(lane_w >= 1, jnp.float32)     # kw=0 reads w-1
    m_last = jnp.asarray(lane_w <= width - 2, jnp.float32)  # kw=2 reads w+1
    mask = jnp.stack([
        m_first if cw == 0 else m_last if cw == 2 else
        jnp.ones_like(m_first)
        for _ in range(9) for cw in range(3)
    ])                                                  # (27, W*C)
    return kt * mask, mask


def _roll(p, shift, axis):
    """pltpu.roll with negative shifts (circular: -s == dim - s)."""
    if shift < 0:
        shift += p.shape[axis]
    return pltpu.roll(p, shift, axis=axis)


def _iter_shifted_planes(x0, x1, x2, t, t_len, h):
    """Yield the 9 (dt, dh) H/T-shifted f32 planes, edges zeroed.

    Generator (not a list) so only one shifted plane is live at a time —
    materializing all nine blew the 16 MB scoped-VMEM budget at the
    (56, 3024) stage-1 block."""
    f32 = jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 0)
    m_top = (row >= 1).astype(f32)        # dh=-1 reads h-1: invalid row 0
    m_bot = (row <= h - 2).astype(f32)    # dh=+1 reads h+1: invalid row H-1

    tm0 = (t >= 1).astype(f32)            # dt=-1 valid only for t>0
    tm2 = (t <= t_len - 2).astype(f32)
    for p, tm in ((x0, tm0), (x1, None), (x2, tm2)):
        p = p.astype(f32)
        if tm is not None:
            p = p * tm
        # b (kh tap) = 0,1,2 -> roll shift 1-b, mask wrapped row
        yield _roll(p, 1, 0) * m_top
        yield p
        yield _roll(p, -1, 0) * m_bot


def _fwd_kernel(x0_ref, x1_ref, x2_ref, kt_ref, o_ref, *, t_len, h, c):
    t = pl.program_id(0) % t_len
    acc = jnp.zeros(x1_ref.shape[1:], jnp.float32)
    planes = _iter_shifted_planes(x0_ref[0], x1_ref[0], x2_ref[0],
                                  t, t_len, h)
    for ab, p in enumerate(planes):
        # cw (kw tap) = 0,1,2 -> lane roll (1-cw)*C; wrap zeroed via kt
        for cw, q in enumerate((_roll(p, c, 1), p, _roll(p, -c, 1))):
            tap = ab * 3 + cw
            acc = acc + q * kt_ref[tap:tap + 1, :]  # 2-D bcast
    o_ref[0] = acc.astype(o_ref.dtype)


def _wgrad_kernel(x0_ref, x1_ref, x2_ref, g_ref, o_ref, *, t_len, h, c):
    t = pl.program_id(0) % t_len

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    g = g_ref[0].astype(jnp.float32)
    rows = []
    planes = _iter_shifted_planes(x0_ref[0], x1_ref[0], x2_ref[0],
                                  t, t_len, h)
    for p in planes:
        for q in (_roll(p, c, 1), p, _roll(p, -c, 1)):
            rows.append(jnp.sum(q * g, axis=0, keepdims=True))  # (1, W*C)
    o_ref[...] = o_ref[...] + jnp.concatenate(rows, axis=0)


def _plane_specs(nt, h, wc):
    """Three t-shifted views of the same (NT, H, WC) array (clamped)."""
    return [
        pl.BlockSpec((1, h, wc),
                     lambda i, d=d: (jnp.clip(i + d, 0, nt - 1), 0, 0))
        for d in (-1, 0, 1)
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_impl(x, w, interpret=False):
    n, t, h, width, c = x.shape
    wc = width * c
    kt, _ = _build_tap_table(w, width, c)
    xr = x.reshape(n * t, h, wc)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t_len=t, h=h, c=c),
        grid=(n * t,),
        in_specs=_plane_specs(n * t, h, wc) + [
            pl.BlockSpec((27, wc), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n * t, h, wc), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xr, xr, xr, kt)
    return out.reshape(x.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wgrad_impl(x, g, interpret=False):
    n, t, h, width, c = x.shape
    wc = width * c
    xr = x.reshape(n * t, h, wc)
    gr = g.reshape(n * t, h, wc)
    dk_wc = pl.pallas_call(
        functools.partial(_wgrad_kernel, t_len=t, h=h, c=c),
        grid=(n * t,),
        in_specs=_plane_specs(n * t, h, wc) + [
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((27, wc), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((27, wc), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xr, xr, xr, gr)
    _, mask = _build_tap_table(jnp.zeros((3, 3, 3, 1, c)), width, c)
    dk_wc = dk_wc * mask  # zero wrapped-lane contributions
    dk = dk_wc.reshape(27, width, c).sum(axis=1)
    return dk.reshape(3, 3, 3, 1, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3d_lanes(x, w, interpret=False):
    """Depthwise 3x3x3 conv, stride 1, padding 1, channels-last.

    ``x``: (N, T, H, W, C); ``w``: (3, 3, 3, 1, C).  Matches
    ``lax.conv_general_dilated(..., feature_group_count=C)`` to bf16
    tolerance; fwd+bwd run as dense-lane Pallas kernels.
    """
    return _fwd_impl(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    return _fwd_impl(x, w, interpret), (x, w)


def _vjp_bwd(interpret, res, g):
    x, w = res
    # dx = depthwise correlation of g with the tap-reversed kernel
    wf = w[::-1, ::-1, ::-1]
    dx = _fwd_impl(g, wf, interpret).astype(x.dtype)
    dk = _wgrad_impl(x, g, interpret).astype(w.dtype)
    return dx, dk


dw_conv3d_lanes.defvjp(_vjp_fwd, _vjp_bwd)
